package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * SHARD-PARTITIONED PARQUET SINK — the write path for a rendezvous-sharded
 * corpus ([[graft.operators.Packing.rendezvousShard]] computes the shard
 * column; this lays the files out by it).
 *
 * `partitionBy(shard)` gives the two properties a 100-TB corpus store needs:
 * (1) PARTITION PRUNING — a reader filtering on `shard = k` scans only that
 * directory (`PartitionFilters` in the plan, zero data-file IO for the rest),
 * so per-shard consumers (a trainer pulling its assigned shards, an
 * incremental re-crawl touching moved rows only) never pay a full-table scan;
 * (2) STABLE INCREMENTAL LAYOUT — because the HRW assignment moves only
 * ~1/(n+1) of rows when a shard is added, re-sharding rewrites only the
 * affected directories instead of the whole corpus (hash-mod layouts rewrite
 * everything). Each write task writes one file per shard it holds; repartition
 * upstream by the shard column first if small-files pressure matters.
 */
object ShardedSink {

  /** Write `df` under `path` partitioned by `shardCol` (overwrite). */
  def write(df: DataFrame, path: String, shardCol: String): Unit = {
    require(df.columns.contains(shardCol), s"missing shard column '$shardCol'")
    df.write.mode("overwrite").partitionBy(shardCol).parquet(path)
  }

  /** Read a sharded layout back; the shard partition column is restored as a
    * BIGINT column (partition-value inference would otherwise type it INT). */
  def read(spark: SparkSession, path: String, shardCol: String = "shard"): DataFrame = {
    val df = spark.read.parquet(path)
    df.withColumn(shardCol, col(shardCol).cast("long"))
  }
}
