package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-sequence construction — the behavioral-data face of training-set
 * assembly: collapse an event log into one ordered action sequence per
 * entity (the input shape for next-action / session-intent models, and the
 * session-replay string for debugging).
 *
 * Determinism is the whole trick: `collect_list` alone is
 * partition-order-dependent, so the sequence is assembled as
 * `sort_array(collect_list(struct(ts, tie, type)))` — the struct sort
 * totally orders by (timestamp, tie-breaker id), making the aggregation
 * independent of physical layout — then projected to the type string. One
 * shuffle on the entity key; the sequence payload rides the exchange as the
 * compact struct array. Null action types are dropped BEFORE aggregation
 * (both engines would otherwise disagree on their ordinal positions).
 *
 * @param tieCol unique tiebreak column for equal timestamps
 * @return (userCol, n_events, seq) — seq = action types joined with ">".
 */
object Sequences {

  def userEventSequences(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    events
      .filter(col(typeCol).isNotNull)
      .groupBy(col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        concat_ws(">",
          expr(s"transform(sort_array(collect_list(struct($tsCol, $tieCol, $typeCol)))," +
            s" x -> x.$typeCol)")).as("seq"))
  }
}
