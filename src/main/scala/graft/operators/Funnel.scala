package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventTime

/**
 * Funnel and cohort-retention analytics over an event log — the two classic
 * behavioral aggregations an analytics engine is asked for first.
 *
 * Funnel semantics are chained-earliest-match: a user completes step i+1 iff
 * some step-(i+1) event has a strictly greater timestamp than the earliest
 * chain satisfying steps 1..i. That greedy chain is computed in ONE shuffle:
 * `sort_array(collect_list(struct(µs, tie, type)))` per user, then a
 * higher-order `aggregate` fold over the ordered array advances a stage
 * counter — entirely inside codegen'd expressions, no second exchange and no
 * per-step join (the k-join formulation the SQL oracle uses would cost k
 * shuffles at 100 TB; the fold costs one). Both formulations are equivalent:
 * a timestamp-ordered greedy scan with a strict `>` carry visits exactly the
 * chained `min(ts)` anchors, and ties on the anchor value are excluded by
 * strictness on both sides, so tie ORDER never matters.
 *
 * Retention is the cohort matrix: cohort = calendar day of the user's first
 * event, cell = distinct users from that cohort active at each day offset.
 * Two exchanges (user-keyed min, then cohort-cell distinct count) — both on
 * aggregated keys, never on the raw log twice.
 */
object Funnel {

  /** Per-user completed-stage count (0..steps.length) for the ordered funnel. */
  def userStages(
      events: DataFrame, userCol: String, typeCol: String, tieCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    val stepsArr = steps.map(s => s"'${s.replace("'", "''")}'").mkString("array(", ", ", ")")
    val k = steps.length
    events
      .withColumn("__tsu", EventTime.tsMicros(events))
      .filter(col(typeCol).isin(steps: _*)) // only funnel events ride the exchange
      .groupBy(col(userCol))
      .agg(expr(
        s"""aggregate(
           |  sort_array(collect_list(struct(__tsu AS tsu, $tieCol AS tie, $typeCol AS tp))),
           |  named_struct('stage', 0, 'last', CAST(-1 AS BIGINT)),
           |  (acc, x) -> IF(acc.stage < $k
           |                 AND x.tp = element_at($stepsArr, acc.stage + 1)
           |                 AND x.tsu > acc.last,
           |               named_struct('stage', acc.stage + 1, 'last', x.tsu), acc),
           |  acc -> acc.stage)""".stripMargin).as("stage"))
  }

  /** Funnel summary: one row per step with the users reaching at least it. */
  def funnel(
      spark: SparkSession, events: DataFrame, userCol: String, typeCol: String,
      tieCol: String, steps: Seq[String]): DataFrame = {
    import spark.implicits._
    val byStage = userStages(events, userCol, typeCol, tieCol, steps)
      .groupBy(col("stage")).agg(count(lit(1)).as("n")) // ≤ k+1 rows
    val dim = steps.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toDF("step", "event_type")
    dim.join(byStage, byStage("stage") >= dim("step"), "left")
      .groupBy(col("step"), col("event_type"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("users"))
  }

  /** Cohort retention matrix: (cohort day, day offset, distinct active users). */
  def retention(events: DataFrame, userCol: String): DataFrame = {
    val ev = events.withColumn("__d", to_date(EventTime.tsCol(events)))
      .select(col(userCol), col("__d"))
    val first = ev.groupBy(col(userCol)).agg(min(col("__d")).as("__c"))
    ev.join(first, userCol)
      .groupBy(
        date_format(col("__c"), "yyyy-MM-dd").as("cohort"),
        datediff(col("__d"), col("__c")).cast("long").as("day_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
  }
}
