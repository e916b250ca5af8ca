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
}
