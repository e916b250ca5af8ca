package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tHashUdf

/**
 * Deterministic, key-stable sampling and dataset splitting — the reproducible
 * alternative to seeded RNG sampling for training-data pipelines: a row's
 * bucket depends only on its key, so re-running the pipeline (or re-sharding
 * the data) never moves a document between train/val/test, and joining two
 * tables sampled on the same key keeps them aligned.
 *
 * Bucket = `tHash(key as string) mod nBuckets` — the library's deterministic
 * polynomial hash, mirrored 1:1 in oracle SQL. Note: tHash is a parity-focused
 * hash, not an avalanche hash — short sequential keys (single digits) bucket
 * with visible structure; realistic multi-character keys (ids, URLs, digests)
 * spread fine, and determinism is the contract here.
 */
object Sampling {

  /** Bucket column in [0, nBuckets) for the stringified key — floor mod
    * (`pmod`), so the contract holds even if the hash goes negative on
    * Long-overflowing inputs (very long keys). */
  def hashBucket(key: Column, nBuckets: Int = 100): Column =
    pmod(tHashUdf(key.cast("string")), lit(nBuckets.toLong)).cast("long")

  /** Keep the deterministic `keepPct`% of rows by key bucket. */
  def deterministicSample(df: DataFrame, keyCol: String, keepPct: Int): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct must be in [0,100], got $keepPct")
    df.filter(hashBucket(col(keyCol)) < keepPct)
  }

  /**
   * Key-stable train/val/test split: adds `bucket` (0-99) and `split`
   * ("train" for bucket < trainPct, "val" for the next valPct buckets,
   * "test" otherwise).
   */
  def withSplit(df: DataFrame, keyCol: String, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"need trainPct + valPct <= 100, got $trainPct + $valPct")
    val b = hashBucket(col(keyCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }
}
