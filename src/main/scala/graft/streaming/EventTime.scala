package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Shared event-time column handling for the events table: with
 * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench) a
 * TIMESTAMP(NANOS) parquet column arrives as Long nanos; a native
 * TimestampType passes through. All µs arithmetic is exact integer division —
 * µs, not ns, because engines whose TIMESTAMP is µs (the DuckDB oracle)
 * surface parquet nano-timestamps only at µs precision.
 */
object EventTime {

  /** TimestampType view of `ts` (µs precision either way). */
  def tsCol(df: DataFrame): Column =
    if (df.schema("ts").dataType == LongType) expr("timestamp_micros(ts DIV 1000)")
    else col("ts")

  /** Microsecond-epoch Long view of `ts`. */
  def tsMicros(df: DataFrame): Column =
    if (df.schema("ts").dataType == LongType) expr("ts DIV 1000")
    else unix_micros(col("ts"))

  /**
   * Order-invariant sum of a double column, rounded to 4: values quantized to
   * exact integer micro-units BEFORE aggregation, so distributed reduction
   * order cannot perturb the result (a raw double sum differs in the last ulp
   * depending on combine order, and round() flips at decimal boundaries —
   * the same integer-quantization technique as SimJoin.tfidfPairs /
   * CorpusStats.unigramLogLoss, mirrored 1:1 in the oracles).
   */
  def quantizedSum4(c: Column): Column =
    round(sum(floor(c.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
      .cast("double") / lit(1000000.0), 4)
}
