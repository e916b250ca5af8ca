package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ONE-CALL INGEST SCREENING — the verdict table a crawl pipeline computes
 * for every new batch before anything lands in the corpus, composing three
 * already-hardened operators into the standard admission checklist:
 *
 *  - `exact_dup`: the batch doc's digest is already in the history digest
 *    frame, or it is a non-canonical copy within the batch
 *    ([[Dedup.exactIncrement]] — digests only, text never reshuffles);
 *  - `near_dup`: MinHash-LSH Jaccard ≥ threshold against ANY history doc
 *    ([[Dedup.minHashLshPairsBetween]] — banded, neither side broadcast);
 *  - `contaminated`: shares a 13-word-gram with a benchmark doc
 *    ([[Decontaminate.flagged]] — bench grams broadcast);
 *  - `keep`: admitted = none of the above.
 *
 * Scale shape is inherited from the parts: the history rides as digests /
 * banded signatures, the bench as hashed grams — the batch text itself is
 * read once per screen and the flags join back on the id only. Null-text
 * batch rows are absent (the [[Dedup.exactIncrement]] contract).
 *
 * @return one verdict row per batch doc:
 *         (idCol, content_hash, exact_dup, near_dup, contaminated, keep)
 */
object IngestScreen {

  def screen(
      batch: DataFrame, idCol: String, textCol: String,
      history: DataFrame, bench: DataFrame,
      threshold: Double = 0.8, gramN: Int = 13): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val seen = Dedup.exactDigests(history, textCol)
    val ex = Dedup.exactIncrement(batch, idCol, textCol, seen)
    val nd = Dedup.minHashLshPairsBetween(
        batch, idCol, textCol, history, idCol, textCol, threshold)
      .select(col("id_a").as("__nid")).distinct()
      .withColumn("__nd", lit(1L))
    val ct = Decontaminate.flagged(batch, idCol, textCol, bench, idCol, textCol, gramN)
      .select(col(idCol).as("__ctid")).distinct()
      .withColumn("__ct", lit(1L))
    ex.join(nd, col(idCol) === col("__nid"), "left")
      .join(ct, col(idCol) === col("__ctid"), "left")
      .select(col(idCol), col("content_hash"),
        (lit(1L) - col("kept")).as("exact_dup"),
        coalesce(col("__nd"), lit(0L)).as("near_dup"),
        coalesce(col("__ct"), lit(0L)).as("contaminated"),
        when(col("kept") === 1L && col("__nd").isNull && col("__ct").isNull, 1L)
          .otherwise(0L).as("keep"))
  }
}
