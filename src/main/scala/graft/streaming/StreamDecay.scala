package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming DECAYED ENGAGEMENT — the online face of
 * [[graft.operators.EventStats.decayedEngagement]]: events arrive
 * continuously and every user carries a recency-weighted score. The batch
 * op anchors decay to the corpus max day, which a stream cannot know; the
 * streaming contract is "score as of `anchor`" — each arriving event
 * contributes `cents DIV 2^((anchor − day) DIV halfLifeDays)` immediately
 * (the same power-of-two staircase, same 40-shift cap), so per-user state
 * is just the running `(n_events, decayed_cents)` pair: O(1) per event,
 * trivially mergeable, BIGINT-exact.
 *
 * On a BATCH frame with `anchor` = the frame's own max day, every user
 * group sees all its rows at once with empty state, and the emitted totals
 * are EXACTLY [[graft.operators.EventStats.decayedEngagement]] — the
 * `stream_decayed_batch` gate pins that identity against the same SQL
 * oracle as `events_decayed`.
 */
object StreamDecay {

  case class EvC(user_id: Long, c: Long)
  case class Decayed(user_id: Long, n_events: Long, decayed_cents: Long)

  /**
   * @param anchor the "as of" day decay is measured against (events newer
   *               than the anchor would decay by 0 steps — day diffs clamp
   *               at 0 via the shift floor, matching the batch op where the
   *               anchor IS the max day)
   * @return one row per user: (user_id, n_events, decayed_cents)
   */
  def scores(events: DataFrame, userCol: String, valueCol: String,
      anchor: java.sql.Date, halfLifeDays: Int = 7): Dataset[Decayed] = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val spark = events.sparkSession
    import spark.implicits._
    val slim = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol).cast("long").as("user_id"),
        expr(s"CAST(floor($valueCol * 100.0 + 0.5) AS BIGINT) DIV " +
          s"shiftleft(CAST(1 AS BIGINT), CAST(least(greatest(" +
          s"datediff('${anchor}', to_date(${tsExpr(events)})), 0) DIV $halfLifeDays, 40) AS INT))")
          .as("c"))
      .as[EvC]
    slim.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), Decayed](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EvC], state: GroupState[(Long, Long)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { e => n += 1L; s += e.c }
          state.update((n, s))
          Iterator.single(Decayed(user, n, s))
      }
  }

  /** SQL-text view of the ts column (for embedding in an expr string). */
  private def tsExpr(df: DataFrame): String = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => "timestamp_micros(ts DIV 1000)"
    case _                                   => "CAST(ts AS TIMESTAMP)"
  }
}
