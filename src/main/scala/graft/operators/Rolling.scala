package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-safe ROLLING time-window aggregation — the trailing-7-day revenue /
 * volume line every operational dashboard asks for.
 *
 * The naive form — `sum(x) OVER (ORDER BY date RANGE BETWEEN INTERVAL 6 DAYS
 * PRECEDING AND CURRENT ROW)` — is a partition-less window: Spark funnels
 * EVERY row through one task (the same trap [[DenseRank]] and
 * [[CorpusStats.quantileBuckets]] exist to avoid). The scale-safe shape is:
 * (1) pre-aggregate to the DAY grain — one distributed shuffle reduces
 * billions of rows to |days| rows (thousands, forever); (2) resolve the
 * trailing window on that tiny relation with a bounded self-join. Step 2's
 * cost is |days|·window — irrelevant — while step 1 is the only pass over
 * the raw table. Values are quantized to exact integer cents BEFORE the sums
 * (reduction-order-proof, the engine-wide stance).
 */
object Rolling {

  /**
   * Trailing `windowDays`-day totals per active day.
   * @param dateCol timestamp-like column (cast through timestamp to a date)
   * @return (day 'yyyy-MM-dd', rolling_orders, rolling_cents) — one row per
   *         day PRESENT in the data; trailing days without traffic simply
   *         contribute nothing.
   */
  def trailingDailySum(
      df: DataFrame, dateCol: String, valueCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val daily = df
      .groupBy(to_date(col(dateCol).cast("timestamp")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col(valueCol).cast("double") * lit(100.0) + lit(0.5)).cast("long"))
          .as("cents"))
    daily.as("a").select(col("a.day").as("__d"))
      .join(daily.as("b"),
        col("b.day") >= date_sub(col("__d"), windowDays - 1) && col("b.day") <= col("__d"))
      .groupBy(date_format(col("__d"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("b.n")).as("rolling_orders"), sum(col("b.cents")).as("rolling_cents"))
  }
}
