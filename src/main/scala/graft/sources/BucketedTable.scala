package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * BUCKETED PARQUET SINK + SOURCE — the co-located-join storage layout.
 *
 * Writing two tables bucketed (and sorted) by the same join key with the same
 * bucket count lets Spark's scan report a `HashPartitioning` that already
 * satisfies a SortMergeJoin's distribution requirement: the join (and any
 * follow-up aggregation on the same key) runs with ZERO exchanges. At 100 TB
 * this converts the single most expensive operation in a fact-dimension
 * pipeline — the repeated shuffle of the fact table onto its join key — into
 * a one-time layout cost paid at ingest, amortized over every downstream
 * query. (The same trade the reference cannot express: it is a single-node
 * in-memory library; bucketing is the cluster-storage analogue of its
 * pre-built CSR index.)
 *
 * Spark constraint: bucketed layout metadata lives in the session catalog, so
 * the sink is `saveAsTable` with an explicit external `path` — plain
 * `.parquet(path)` writes cannot record bucket spec. Readers MUST go through
 * `spark.table(name)`; reading the files directly loses the bucketing (and
 * silently reintroduces the exchange — the plan, not the result, is what the
 * layout buys).
 */
object BucketedTable {

  /** Write `df` as an external bucketed+sorted parquet table, replacing any
    * previous registration of `name`. Bucket and sort column = `keyCol`;
    * `nBuckets` should be sized so one bucket of the LARGEST co-bucketed
    * table fits an executor's scan partition (buckets are not splittable). */
  def writeBucketed(
      df: DataFrame, name: String, path: String, keyCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(name)
  }

  /** Read a bucketed table registered by [[writeBucketed]] in this session. */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** [[writeBucketed]] both sides with one bucket spec, read them back, and
    * inner-join on `keyCol` — the layout demo in one call: with both scans
    * bucketed the executed plan contains no shuffle exchange (pinned in
    * PlanSpec). `prefix` namespaces the table registrations + paths so
    * concurrent sessions (or SFs) cannot collide. */
  def cobucketedJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      nBuckets: Int, prefix: String): DataFrame = {
    val spark = left.sparkSession
    val base = s"${sys.props("java.io.tmpdir")}/graft_bucketed/$prefix"
    writeBucketed(left, s"${prefix}_l", s"$base/l", keyCol, nBuckets)
    writeBucketed(right, s"${prefix}_r", s"$base/r", keyCol, nBuckets)
    readBucketed(spark, s"${prefix}_l").join(readBucketed(spark, s"${prefix}_r"), keyCol)
  }
}
