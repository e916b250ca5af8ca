package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.SimSearch

/**
 * Streaming face of incremental IVF assignment — route every arriving
 * micro-batch of embeddings onto an already-trained coarse quantizer
 * ([[SimSearch.IvfModel]]) WITHOUT retraining: the stream-static analogue of
 * the `ann_ivf_incr` batch gate, completing the incremental-IVF story the way
 * `stream_decon_batch` completes decontamination. Train the codebook once on
 * the accumulated corpus; attach this to the crawl stream; retrain only when
 * the [[SimSearch.ivfDrift]] monitor degrades.
 *
 * There is no state and no watermark: assignment is a pure per-row function
 * of the broadcast model, so [[SimSearch.ivfAssign]] (a Catalyst-expression
 * projection since r15 — no RDD exit, which is what makes it legal on a
 * streaming frame) runs unchanged whether `batch` is a static frame or a
 * `readStream` source. Consequences, spec-pinned:
 *
 *  - BATCH ≡ STREAM: on the same rows the streaming output is bit-identical
 *    to the batch face (the `stream_ivf_assign` gate runs the batch face
 *    against the shared SQL oracle; `StreamingIvfSpec` replays the same rows
 *    through a MemoryStream).
 *  - SPLIT-INVARIANCE / REPLAY DETERMINISM: any partition of the input into
 *    micro-batches yields outputs whose union equals the one-shot batch
 *    output — no cross-batch state means no order or boundary sensitivity
 *    (`StreamReplayProps`).
 *
 * Output mode: Append (every input row maps to ≤ 1 output row, emitted in
 * its own micro-batch). Null / zero-norm embeddings are dropped by the
 * shared eligibility contract.
 */
object StreamIvfAssign {

  /** Assign each (streaming or static) row to its nearest trained centroid.
    * @return (idCol, list, cos_micro) — [[SimSearch.ivfAssign]]'s contract. */
  def assign(batch: DataFrame, idCol: String, vecCol: String,
      ivf: SimSearch.IvfModel): DataFrame =
    SimSearch.ivfAssign(batch, idCol, vecCol, ivf)
}
