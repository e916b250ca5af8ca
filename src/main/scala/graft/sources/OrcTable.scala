package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * ORC SINK + SOURCE — the third columnar interchange beside Parquet and the
 * line formats ([[JsonlTable]]/[[CsvTable]]): warehouse-side corpora
 * (Hive/Trino estates) routinely arrive as ORC. Being a TYPED columnar
 * format, the round trip is bit-exact for every column INCLUDING empty
 * strings (the CSV caveat does not apply) and nulls; files carry their own
 * schema and per-stripe min/max indexes, so predicate pushdown and column
 * pruning work at scan time exactly as with Parquet — `.explain` shows the
 * same PushedFilters/ReadSchema surface.
 *
 * Reads still take an EXPLICIT caller schema: schema-on-read drift (a
 * widened column in newer files) must fail loudly at plan time, not
 * propagate silently.
 */
object OrcTable {

  /** Write `df` under `path` as zlib ORC (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)

  /** Read an ORC table with the caller's explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
