package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-column table profiler — the `ANALYZE TABLE` face of a curation
 * pipeline: one output row per profiled column with row/null/distinct counts
 * and stringified min/max. The first thing run against a new 100 TB crawl
 * drop (is doc_id unique? how sparse is lang? what's the n_chars range?) and
 * the drift check between snapshots (diff two profiles — cheap because the
 * profile is |columns| rows regardless of corpus size).
 *
 * Exactness: distinct counts are exact (`count(DISTINCT)` — one shuffle of
 * the column's values per profiled column). At scale, swap in
 * [[CorpusStats.approxDistinctByGroup]]'s KMV sketch for the heavy columns;
 * the exact form is the oracle-checkable default. min/max are cast to
 * string AFTER aggregation (numeric min, then render) so the row shape is
 * uniform across column types.
 *
 * @return (col_name, n_rows, n_nulls, n_distinct, min_str, max_str) — one
 *         row per entry of `cols`, in the given order.
 */
object TableProfile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not found: ${missing.mkString(", ")}")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
  }
}
