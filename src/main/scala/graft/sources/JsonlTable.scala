package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * JSONL (newline-delimited JSON) SINK + SOURCE — the lingua franca of corpus
 * interchange: crawl dumps, HF datasets, eval sets all move as JSONL. Spark's
 * json writer emits one object per line (exactly the JSONL contract) and the
 * reader streams line-splittable files, so both directions parallelize like
 * any text-splittable format at 100 TB.
 *
 * Two contracts the defaults would silently break, pinned here:
 * - READ WITH AN EXPLICIT SCHEMA. Schema inference is a full extra pass over
 *   the data (prohibitive at scale) and type-guesses per file slice;
 *   `FAILFAST` surfaces corrupt lines instead of nulling them into the
 *   corpus.
 * - Unicode and quotes round-trip through JSON escaping, so `text` columns
 *   survive bit-exactly — the property the round-trip gate hashes.
 */
object JsonlTable {

  /** Write `df` under `path` as JSONL (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL layout back under an explicit, mandatory schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
