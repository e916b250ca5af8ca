package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{qualityScoreCol, tHashUdf}

/**
 * END-TO-END CURATION PIPELINE — the composition a training-data team
 * actually runs, as ONE operator with ONE oracle: rule-based quality filter →
 * exact dedup (keep min-id copy) → temperature-rebalanced per-source quota →
 * deterministic hash-priority selection. The output is the curated document
 * selection with its per-source rank, reproducible bit-for-bit across runs
 * and engines (every stage is an already-gated primitive of this library:
 * [[graft.functions.TextFunctions.qualityScoreCol]], [[Dedup.exact]]'s
 * min-per-digest rule, [[Sampling.temperatureShares]]' integer floor-sqrt
 * quotas, [[Sampling]]'s tHash priority ordering).
 *
 * Scale shape, stage by stage: quality scoring is per-row scalar (no
 * shuffle); dedup is one window over the md5 digest (shuffles ids + 16-byte
 * digests, never text twice); quotas aggregate a per-source count against a
 * broadcast 1-row total; selection ranks per source by the deterministic
 * key-hash priority. The per-source rank is the one full-sort-per-group cost
 * — quotas are ≤ budget, so at 100 TB pre-truncate each source to `budget`
 * rows with a fixed-k rank first (plans `WindowGroupLimit`) and re-rank the
 * survivors; at gate scale the single window is the honest plan.
 *
 * @param minQuality keep docs with quality ≥ this (score rounded to 6, so
 *                   the threshold compare is engine-exact)
 * @param budget     total curated documents wanted across all sources
 * @return (idCol, sourceCol, rank) — the selected docs; rank 1..quota within
 *         each source by (tHash priority, id).
 */
object CuratePipeline {

  def curate(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      minQuality: Double, budget: Long): DataFrame = {
    require(budget > 0L, s"budget must be positive, got $budget")
    val scored = docs
      .select(col(idCol), col(sourceCol), col(textCol),
        qualityScoreCol(col(textCol)).as("__q"))
      .filter(col("__q") >= minQuality)
    // Persisted: three consumers (per-source counts → quotas, the rank
    // window, the final join) would otherwise re-run the scoring scan and the
    // dedup window three times each — the CleanCorpus shared-stage pattern.
    val kept = scored
      .withColumn("__kd", min(col(idCol)).over(Window.partitionBy(md5(col(textCol)))))
      .filter(col(idCol) === col("__kd"))
      .select(col(idCol), col(sourceCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = kept.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val weights = counts.select(col(sourceCol),
      floor(sqrt(col("__n").cast("double"))).cast("long").as("__w"))
    val total = weights.agg(sum(col("__w")).as("__tw"))
    val quota = weights.crossJoin(broadcast(total))
      .select(col(sourceCol), expr(s"(__w * ${budget}L) DIV __tw").as("__quota"))
    val priority = pmod(tHashUdf(col(idCol).cast("string")), lit(1048576L))
    val ranked = kept.withColumn("__rnk",
      row_number().over(Window.partitionBy(col(sourceCol)).orderBy(priority, col(idCol))))
    ranked.join(quota, sourceCol)
      .filter(col("__rnk") <= col("__quota"))
      .select(col(idCol), col(sourceCol), col("__rnk").cast("long").as("rank"))
  }
}
