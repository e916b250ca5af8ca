package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation over the `events` table — written so the SAME
 * transformation runs in batch (driver-verifiable against a SQL oracle) and as a
 * Structured Streaming query (watermark + append mode), which is the Spark-idiomatic
 * way to keep one definition for both. The reference has no streaming surface
 * (SURVEY §2.2); this is the pipeline extension.
 */
object EventWindows {

  /** Event timestamp — see [[EventTime.tsCol]] (shared nanos-vs-timestamp guard). */
  private def tsCol(df: DataFrame): Column = EventTime.tsCol(df)

  /**
   * Tumbling 1-hour counts + value sums per event type.
   * Output: (ws: String "yyyy-MM-dd HH:mm:ss" window start, event_type, n, sum_value).
   * Window starts align to the epoch, so they equal date_trunc('hour', ts) for
   * 1-hour tumbling windows — which is exactly the SQL oracle.
   */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(tsCol(events), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), EventTime.quantizedSum4(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_value"))

  /**
   * SLIDING 2-hour windows advancing hourly: every event lands in exactly two
   * windows (the one starting at its truncated hour and the one an hour
   * earlier) — the standard trailing-window rate metric. Same epoch
   * alignment as [[hourlyByType]], so the SQL oracle enumerates the two
   * starts per event with a 2-element series.
   * Output: (ws window start, event_type, n, sum_value).
   */
  def slidingTwoHourByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(tsCol(events), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), EventTime.quantizedSum4(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming form of [[slidingTwoHourByType]]: same windows behind a watermark. */
  def slidingTwoHourByTypeStream(events: DataFrame, watermark: String = "3 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), EventTime.quantizedSum4(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming form of [[hourlyByType]]: same aggregation behind a watermark. */
  def hourlyByTypeStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), EventTime.quantizedSum4(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_value"))
}
