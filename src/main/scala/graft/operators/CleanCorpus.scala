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
 *     drop the higher id (transitively consistent: in any near-dup group every
 *     doc except the minimum has a lower-id partner, so exactly the minima
 *     survive pairwise removal).
 *
 * Each stage is a verified operator ([[Dedup]], TextFunctions) and the whole
 * composition stays one lazy plan (plus the LSH-verified near-dup join) —
 * shuffles only on content hash and shingles, never on full text.
 */
object CleanCorpus {

  /** @return (idCol, langid, quality) — the surviving cleaned corpus. */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, langs: Seq[String],
      nearDupThreshold: Double = 0.8): DataFrame = {
    val scored = docs.select(col(idCol), col(textCol),
        qualityScoreCol(col(textCol)).as("quality"),
        langIdCol(wordsCol(col(textCol))).as("langid"))
      .filter(col("quality") >= minQuality && col("langid").isInCollection(langs))
    val exactCanon = Dedup.exact(scored, idCol, textCol)
      .filter(col(idCol) === col("canonical_id")).select(col(idCol))
    val afterExact = scored.join(exactCanon, idCol)
    val nearDupLosers = Dedup.jaccardPairs(afterExact, idCol, textCol, nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    afterExact.join(nearDupLosers, Seq(idCol), "left_anti")
      .select(col(idCol), col("langid"), col("quality"))
  }
}
