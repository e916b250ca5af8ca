package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wordNGramHashUdf

/**
 * Streaming benchmark decontamination against a STATIC benchmark set — the
 * streaming face of [[graft.operators.Decontaminate.flagged]]: documents
 * arrive continuously and any that share an n-word gram with a benchmark
 * document are flagged before they can enter the training mix. The hygiene
 * complement of [[StreamNearDup]]: that one holds the dedup line, this one
 * holds the eval-leak line.
 *
 * Plan shape: the benchmark side is gram-hashed ONCE (a static frame —
 * cached across micro-batches, and tiny by nature so it broadcasts); each
 * micro-batch gram-hashes only its own rows and equi-joins on the 64-bit
 * gram hash (stream-static join, stateless). Exact on grams — the same
 * conservative-flagging stance as the batch operator.
 *
 * State: the cross-batch `dropDuplicates` holds one row per emitted
 * (doc, bench) pair — exactly-once flagging per pair, unbounded by default
 * (the [[StreamDedup]] NoTimeout stance). For bounded state on event-time
 * streams, apply `withWatermark` upstream and swap in
 * `dropDuplicatesWithinWatermark` in your own assembly.
 *
 * Works identically on a batch frame: batch output = exactly
 * [[graft.operators.Decontaminate.flagged]] (distinct collision pairs),
 * spec-pinned by the parity test and the `stream_decon_batch` gate.
 */
object StreamDecontaminate {

  /**
   * @param stream streaming (or batch) documents to screen
   * @param bench  STATIC benchmark/evaluation set (must not be streaming)
   * @param n      gram width in words (13 is the published convention)
   * @return (idCol, bench_id) — one row per flagged (doc, benchmark doc)
   *         collision pair, exactly-once across batches
   */
  def flagAgainst(
      stream: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 13): DataFrame = {
    require(!bench.isStreaming, "bench must be a static frame (the reference side)")
    val bh = bench.select(col(benchIdCol).as("bench_id"),
        explode(wordNGramHashUdf(n)(col(benchTextCol))).as("__gh"))
      .distinct()
      .cache() // static side: gram-hash the benchmark once, not once per batch
    val sh = stream.select(col(idCol).as("__id"),
      explode(wordNGramHashUdf(n)(col(textCol))).as("__gh"))
    sh.join(broadcast(bh), "__gh")
      .dropDuplicates("__id", "bench_id") // multi-gram collisions + cross-batch re-flags
      .select(col("__id").as(idCol), col("bench_id"))
  }
}
