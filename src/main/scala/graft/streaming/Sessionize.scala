package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event sessionization: group each user's events into sessions separated by
 * inactivity gaps > `gapNanos`.
 *
 * Batch form ([[sessions]]): classic gaps-and-islands — lag + cumulative sum
 * over a per-user window; all-integer arithmetic on nanosecond epochs so the
 * DuckDB oracle matches exactly. Streaming form ([[sessionsStream]]): Spark's
 * native `session_window` with a watermark — same grouping semantics, state
 * managed by the engine.
 */
object Sessionize {

  /** Microsecond-epoch view of the ts column — see [[EventTime.tsMicros]]. */
  private def tsMicros(df: DataFrame): Column = EventTime.tsMicros(df)

  /**
   * @return (user_id, session, n_events, start_us, end_us, sum_value):
   *         session = 1-based session ordinal per user; start/end as exact
   *         microsecond epochs; sum_value rounded to 4 decimals.
   */
  def sessions(events: DataFrame, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"), col("event_id"))
    events
      .withColumn("__us", tsMicros(events))
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(w) > gapMicros, 1L)
          .otherwise(when(lag(col("__us"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sess").as("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        EventTime.quantizedSum4(col("value")).as("sum_value"))
      .select(col("user_id"), col("session"), col("n_events"),
        col("start_us"), col("end_us"), col("sum_value"))
  }

  /** Streaming-native variant: session_window grouping behind a watermark. */
  def sessionsStream(events: DataFrame, gap: String, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), EventTime.quantizedSum4(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))
}
