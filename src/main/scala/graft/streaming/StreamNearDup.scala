package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Streaming NEAR-duplicate filtering against a STATIC reference corpus — the
 * streaming face of [[graft.operators.Dedup.simHashPairs]]: documents arrive
 * continuously and any that are SimHash-near-duplicates (Hamming distance ≤
 * `maxHamming` over the 64-bit fingerprint) of an already-curated corpus are
 * flagged. The incremental complement of batch near-dup: dedup the corpus
 * once in batch, then hold the LINE against new arrivals in a stream.
 *
 * Plan shape: the corpus is fingerprinted and banded ONCE (a static frame —
 * cache it across micro-batches); each micro-batch fingerprints only its own
 * rows, joins band-for-band (stream-static equi-join, stateless), filters on
 * exact Hamming distance, and `dropDuplicates` collapses multi-band
 * collisions of the same (doc, match) pair. Banding keeps the per-batch join
 * linear in collisions (pigeonhole-exact for maxHamming < nBands, same
 * guarantee as the batch operator); nothing is collected to the driver.
 *
 * State: the cross-batch `dropDuplicates` holds one row per emitted (doc,
 * match) pair — exactly-once flagging per pair, unbounded by default (the
 * [[StreamDedup]] NoTimeout stance; re-keyed arrivals of the same doc id are
 * collapsed too). For bounded state on event-time streams, apply
 * `withWatermark` upstream and swap in `dropDuplicatesWithinWatermark` in
 * your own assembly.
 *
 * Works identically on a batch frame (the join is the same; dropDuplicates
 * is a plain distinct): batch output = the (stream ∩ corpus) slice of
 * `simHashPairs`-style banded near-dup pairs, spec-pinned.
 */
object StreamNearDup {

  /**
   * @param stream     streaming (or batch) documents to screen
   * @param corpus     STATIC reference corpus (must not be a streaming frame)
   * @param maxHamming flag pairs with Hamming distance ≤ this (≤ nBands-1 for
   *                   the exact pigeonhole guarantee)
   * @param bandBits   8 (exact ≤ 7) or 16 (exact ≤ 3 — the 10⁹-doc shape)
   * @param excludeSameId drop self-matches by id equality (screening a stream
   *                   drawn from the corpus itself)
   * @return (idCol, matched_id, hamming) — one row per flagged pair,
   *         exactly-once across batches
   */
  def flagAgainst(
      stream: DataFrame, idCol: String, textCol: String,
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      maxHamming: Int, bandBits: Int = 8,
      excludeSameId: Boolean = true): DataFrame = {
    require(!corpus.isStreaming, "corpus must be a static frame (the reference side)")
    val nBands = 2 * (32 / bandBits)
    require(maxHamming < nBands,
      s"$bandBits-bit banding ($nBands bands) is only exact for maxHamming <= ${nBands - 1}")
    val cBands = Dedup.simHashBands(
        Dedup.simHashFingerprints(corpus, corpusIdCol, corpusTextCol)
          .select(col(corpusIdCol).as("__id"), col("simhash1"), col("simhash2")),
        bandBits)
      .select(col("__id").as("__cid"), col("simhash1").as("__c1"),
        col("simhash2").as("__c2"), col("__bi"), col("__bv"))
      .cache() // static side: fingerprint the corpus once, not once per batch
    val sBands = Dedup.simHashBands(
      Dedup.simHashFingerprints(stream, idCol, textCol)
        .select(col(idCol).as("__id"), col("simhash1"), col("simhash2")),
      bandBits)
    val joined = sBands.join(cBands, Seq("__bi", "__bv"))
    val filtered = (if (excludeSameId) joined.filter(col("__id") =!= col("__cid")) else joined)
      .select(col("__id"), col("__cid"),
        (bit_count(col("simhash1").bitwiseXOR(col("__c1"))) +
         bit_count(col("simhash2").bitwiseXOR(col("__c2")))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    filtered
      .dropDuplicates("__id", "__cid") // multi-band collisions + cross-batch re-flags
      .select(col("__id").as(idCol), col("__cid").as("matched_id"), col("hamming"))
  }
}
