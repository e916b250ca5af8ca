package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream windowed correlation join: pair each left event with the
 * right events of the same key that occur within `[ts, ts + maxDelay]` —
 * the click→conversion / request→response attribution shape.
 *
 * The SAME plan runs in batch (driver-verified against a SQL oracle) and as a
 * Structured Streaming stream-stream inner join, where the time-range
 * predicate is what lets Spark bound the join state: with watermarks on both
 * sides, rows older than `watermark + maxDelay` are evicted from state, so
 * state size is O(events in the delay horizon), not O(stream).
 *
 * Both inputs must carry an event-time `ts` TimestampType column.
 */
object StreamJoin {

  /**
   * @param maxDelay SQL interval string, e.g. "30 minutes"
   * @param watermark when set, applied to BOTH sides (required for streaming
   *                  inputs — it bounds the state store; leave None in batch)
   * @return (keyCol, leftIdOut, rightIdOut, delay_us)
   */
  def correlate(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      keyCol: String, maxDelay: String,
      leftIdOut: String = "left_id", rightIdOut: String = "right_id",
      watermark: Option[String] = None): DataFrame = {
    def wm(df: DataFrame): DataFrame =
      watermark.fold(df)(w => df.withWatermark("ts", w))
    val l = wm(left).select(col(keyCol), col(leftId).as(leftIdOut), col("ts").as("__lts"))
    val r = wm(right).select(col(keyCol).as("__rkey"), col(rightId).as(rightIdOut),
      col("ts").as("__rts"))
    l.join(r,
        col(keyCol) === col("__rkey") &&
          col("__rts") >= col("__lts") &&
          col("__rts") <= col("__lts") + expr(s"INTERVAL $maxDelay"))
      .select(col(keyCol), col(leftIdOut), col(rightIdOut),
        (unix_micros(col("__rts")) - unix_micros(col("__lts"))).as("delay_us"))
  }
}
