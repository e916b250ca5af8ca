package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * CSV SINK + SOURCE — the other interchange format corpora actually arrive
 * in (metadata tables, eval sheets, label exports). Same posture as
 * [[JsonlTable]]: line-splittable both directions, so reads and writes
 * parallelize at 100 TB, with the two silent-corruption defaults pinned:
 *
 * - READ WITH AN EXPLICIT SCHEMA and `FAILFAST` — inference is a full extra
 *   pass and per-slice type guessing; corrupt rows must error, not null.
 * - Text columns survive bit-exactly (ONE documented exception: an
 *   empty-string cell reads back as NULL — Spark's CSV reader cannot tell
 *   `""` from an absent value, asserted in SourcesSpec; coalesce on read if
 *   '' must be preserved) only when quoting/escaping handle
 *   embedded delimiters, quotes, and NEWLINES — writes quote everything and
 *   escape quotes with quotes (RFC 4180), reads enable `multiLine` so a
 *   quoted embedded newline is one record, not two corrupt ones. The
 *   round-trip gate hashes `text` to hold exactly this. (`multiLine` trades
 *   intra-file split parallelism for correctness — at scale, shard into
 *   many files, which the writer's partitioning already does; or forbid
 *   newlines upstream with TextFunctions.normalizeTextCol and read
 *   line-split.)
 */
object CsvTable {

  /** Write `df` under `path` as headered, fully-quoted CSV (overwrite).
    * The writer's whitespace-trim defaults are ON — disabled here, or a
    * trailing space inside a quoted field silently vanishes. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Read a CSV layout back under an explicit, mandatory schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
}
