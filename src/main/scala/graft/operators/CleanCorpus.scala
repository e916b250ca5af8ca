package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * End-to-end training-corpus cleaning — the composition the individual
 * operators exist for, as one call:
 *
 *  1. score: heuristic quality + language-ID per document;
 *  2. filter: quality ≥ minQuality and language ∈ langs;
 *  3. exact dedup: keep only the min-id document per identical text;
 *  4. near-dup removal: of any pair with 3-word-shingle Jaccard ≥ nearDupThreshold,
 *     drop the higher id. Survivors form an INDEPENDENT SET of the near-dup
 *     graph (no two survivors are near-dups): per connected component the
 *     minimum id always survives, but a non-minimum doc with no lower-id
 *     partner of its own survives too — this is NOT one-representative-per-
 *     component. Route the pair edges through [[ConnectedComponents]] if
 *     one-per-cluster semantics are required.
 *
 * Each stage is a verified operator ([[Dedup]], TextFunctions); the two frames
 * consumed by multiple downstream stages (`scored` by exact-dedup + join-back,
 * `afterExact` by near-dup pairing + the final anti-join) are persisted
 * MEMORY_AND_DISK so the regex-heavy scoring lineage runs once, not ~3×.
 * Shuffles only on content hash and shingles, never on full text.
 *
 * @param useLsh route near-dup pair generation through the banded
 *               [[Dedup.minHashLshPairs]] (the 100 TB path; default) instead of
 *               the brute inverted-index [[Dedup.jaccardPairs]]. Both verify
 *               candidates with exact Jaccard; LSH can only miss pairs whose
 *               Jaccard barely clears the threshold (per-pair miss probability
 *               (1-j^4)^8 at Jaccard j — see the Dedup scaladoc).
 * @param maxRepetition drop documents whose line-repetition ratio
 *               ([[graft.functions.TextFunctions.repetitionRatioCol]]) exceeds
 *               this bound; 1.0 (default) disables the filter.
 * @param redactPii redact URLs/emails/phone numbers
 *               ([[graft.functions.TextFunctions.redactPiiCol]]) BEFORE scoring
 *               and deduplication, so near-identical docs differing only in
 *               contact details dedup together; off by default.
 * @param persistStages persist the multiply-consumed stage frames. Default
 *               true: `scored` is cached MEMORY_AND_DISK only long enough to
 *               eagerly materialize `afterExact` as a lineage-cut
 *               localCheckpoint, then unpersisted — so `clean` leaves NO
 *               cacheManager-registered blocks behind (the checkpoint blocks
 *               are reference-tracked and freed by the ContextCleaner once the
 *               result is unreferenced). The trade is one eager job inside
 *               `clean`. Pass false for a fully-lazy plan (stages recompute,
 *               ~3× scoring cost).
 */
object CleanCorpus {

  /** @return (idCol, langid, quality) — the surviving cleaned corpus. */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, langs: Seq[String],
      nearDupThreshold: Double = 0.8,
      useLsh: Boolean = true,
      maxRepetition: Double = 1.0,
      redactPii: Boolean = false,
      persistStages: Boolean = true): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val base =
      if (redactPii) docs.withColumn(textCol, redactPiiCol(col(textCol))) else docs
    val repFiltered =
      if (maxRepetition < 1.0) base.filter(repetitionRatioCol(col(textCol)) <= maxRepetition)
      else base
    // Fused single-pass scorer (bit-identical to qualityScoreCol+langIdCol):
    // the Column forms' regex/HOF trees, duplicated again by filter pushdown,
    // overflow codegen and fall back to interpreted eval — see scoreDoc's doc.
    val scored0 = repFiltered.select(col(idCol), col(textCol),
        scoreDocUdf(col(textCol)).as("__sc"))
      .select(col(idCol), col(textCol),
        col("__sc._1").as("quality"), col("__sc._2").as("langid"))
      .filter(col("quality") >= minQuality && col("langid").isInCollection(langs))
    val scored =
      if (persistStages) scored0.persist(StorageLevel.MEMORY_AND_DISK) else scored0
    val exactCanon = Dedup.exact(scored, idCol, textCol)
      .filter(col(idCol) === col("canonical_id")).select(col(idCol))
    val afterExact0 = scored.join(exactCanon, idCol)
    // Eagerly cut lineage at the post-exact-dedup frame, then drop the scoring
    // cache immediately: the r3 bench showed session-lifetime stage caches from
    // this function degrading every query that ran after it.
    val afterExact =
      if (persistStages) {
        val ck = afterExact0.localCheckpoint(true)
        scored.unpersist()
        ck
      } else afterExact0
    val nearDupPairs =
      if (useLsh) Dedup.minHashLshPairs(afterExact, idCol, textCol, nearDupThreshold)
      else Dedup.jaccardPairs(afterExact, idCol, textCol, nearDupThreshold)
    val nearDupLosers = nearDupPairs.select(col("id_b").as(idCol)).distinct()
    afterExact.join(nearDupLosers, Seq(idCol), "left_anti")
      .select(col(idCol), col("langid"), col("quality"))
  }
}
