package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * COMPACTION SINK + MANIFEST-PRUNED SCAN — the two data-layout moves a
 * 100-TB parquet corpus store cannot live without, first-class:
 *
 * 1. COMPACTION: a curation pipeline's final stage (filters, dedup drops,
 *    per-source quotas) leaves thousands of small output files per job;
 *    reading them back pays one task + one footer fetch per file. The sink
 *    rewrites the table as `ceil(rows / targetRowsPerFile)` evenly sized
 *    files — `repartitionByRange` on a chosen stats column, sorted within
 *    each file — so every downstream scan sees large sequential reads.
 *
 * 2. DATA SKIPPING: because the layout is RANGE-partitioned on `statsCol`,
 *    files hold DISJOINT value ranges, which is what makes min/max skipping
 *    effective (under a random layout every file matches every predicate
 *    and no manifest can help). A sidecar manifest — one row per data file:
 *    (file, min, max, rows) — lets a range query open only the files whose
 *    [min, max] interval intersects it, the same move Delta/Iceberg/Hudi
 *    make with their file-statistics manifests. At 100 TB with ~1 GB files
 *    the manifest is ~10⁵ rows — the driver-side file selection is O(#files)
 *    metadata work, the exact cost every manifest-based table format pays,
 *    NOT a data collect.
 *
 * The pruned read re-applies the exact predicate after the file cut, so the
 * result is bit-identical to a full scan + filter regardless of how the
 * manifest rounds — pruning is purely an IO optimization, never a semantics
 * change. Layout cost: one extra counting pass at write time (to size the
 * file count) and one column-pruned read-back pass to collect per-file
 * min/max; both are one-time sink costs amortized over every future scan.
 */
object CompactTable {

  /** Sidecar directory holding the one-row-per-file stats manifest. */
  val ManifestDir = "_graft_manifest"

  private def dataPath(path: String) = s"$path/data"
  private def manifestPath(path: String) = s"$path/$ManifestDir"

  /**
   * Write `df` under `path` as `ceil(n / targetRowsPerFile)` parquet files
   * range-partitioned and sorted by `statsCol`, plus the min/max manifest.
   */
  def writeCompacted(
      df: DataFrame, path: String, statsCol: String,
      targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be > 0, got $targetRowsPerFile")
    require(df.columns.contains(statsCol), s"missing stats column '$statsCol'")
    val n = df.count()
    val nFiles = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    require(nFiles <= Int.MaxValue, s"file count $nFiles overflows Int")
    df.repartitionByRange(nFiles.toInt, col(statsCol))
      .sortWithinPartitions(col(statsCol))
      .write.mode("overwrite").parquet(dataPath(path))
    // Column-pruned read-back: only statsCol is scanned to build the manifest.
    val spark = df.sparkSession
    spark.read.parquet(dataPath(path))
      .select(input_file_name().as("file"), col(statsCol))
      .groupBy(col("file"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(path))
  }

  /** The stats manifest: one row per data file — (file, min_v, max_v, rows). */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(manifestPath(path))

  /** Full (unpruned) read of the compacted data files. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(dataPath(path))

  /**
   * Manifest-pruned range read: open only the files whose [min_v, max_v]
   * intersects [lo, hi], then re-apply the exact predicate. Bit-identical to
   * `read(...).where(statsCol between lo and hi)` by construction.
   */
  def prunedRead(
      spark: SparkSession, path: String, statsCol: String,
      lo: Column, hi: Column): DataFrame = {
    val files = manifest(spark, path)
      .where(col("max_v") >= lo && col("min_v") <= hi)
      .select(col("file"))
      .collect().map(_.getString(0)).sorted
    val pred = col(statsCol) >= lo && col(statsCol) <= hi
    if (files.isEmpty) read(spark, path).where(pred).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*).where(pred)
  }

  def prunedRead(
      spark: SparkSession, path: String, statsCol: String,
      lo: Long, hi: Long): DataFrame =
    prunedRead(spark, path, statsCol, lit(lo), lit(hi))
}
