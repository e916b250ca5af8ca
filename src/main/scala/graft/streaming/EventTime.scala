package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/**
 * Shared event-time column handling for the events table, robust to every
 * parquet encoding the driver has shipped: TIMESTAMP(NANOS) arrives as Long
 * nanos under `spark.sql.legacy.parquet.nanosAsLong=true` (set in
 * Verify/Bench); timestamp[us] with isAdjustedToUTC=false arrives as
 * TIMESTAMP_NTZ (Spark 4 infers NTZ by default) and is cast to the
 * session-local TimestampType — every entry point pins the session timezone
 * to UTC, so the wall-clock µs value is identical to what the DuckDB oracle
 * reads from the same file; a native TimestampType passes through. All µs
 * arithmetic is exact integer division — µs, not ns, because engines whose
 * TIMESTAMP is µs (the DuckDB oracle) surface nano-timestamps only at µs
 * precision.
 */
object EventTime {

  /** TimestampType view of `ts` (µs precision either way). */
  def tsCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("timestamp_micros(ts DIV 1000)")
    case TimestampNTZType => col("ts").cast("timestamp")
    case _                => col("ts")
  }

  /** Microsecond-epoch Long view of `ts`. */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts DIV 1000")
    case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
    case _                => unix_micros(col("ts"))
  }

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
