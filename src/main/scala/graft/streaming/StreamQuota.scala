package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming QUOTA ADMISSION — the ingestion-time face of
 * [[graft.operators.Sampling.cappedQuota]]: documents arrive continuously
 * and each source may admit at most `quota(source)` total weight (chars,
 * tokens, docs); a doc is admitted iff the source's running admitted weight
 * plus its own still fits. The budget gate every bounded-ingest pipeline
 * needs at the front door, as one stateful op: state is a single Long per
 * source (admitted weight so far), rows within a micro-batch are processed
 * in (id asc) order so the verdict is deterministic and — on a BATCH frame,
 * where each source sees all its rows at once with empty state — exactly
 * the relational running-sum-in-id-order admission the `stream_quota_batch`
 * gate pins against the SQL oracle.
 *
 * Arrival-order semantics by design: streams admit what arrives first
 * (within a batch, id order), unlike [[Sampling.quotaFill]]'s weight-desc
 * best-first selection — both are real policies; this is the online one.
 */
object StreamQuota {

  case class DocW(id: Long, source: String, w: Long)
  case class Admit(id: Long, source: String, w: Long, admitted: Long)

  /**
   * @param quotas per-source weight budgets (missing source ⇒ quota 0,
   *               everything rejected — fail closed)
   * @return every input row with its verdict: (id, source, w, admitted 1/0)
   */
  def admit(docs: DataFrame, idCol: String, sourceCol: String, weightCol: String,
      quotas: Map[String, Long]): Dataset[Admit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = quotas // serializable copy for the closure
    val slim = docs
      .filter(col(sourceCol).isNotNull && col(weightCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(sourceCol).as("source"),
        col(weightCol).cast("long").as("w"))
      .as[DocW]
    slim.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admit](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[DocW], state: GroupState[Long]) =>
          val quota = q.getOrElse(src, 0L)
          var used = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.id).map { d =>
            val ok = used + d.w <= quota
            if (ok) used += d.w
            Admit(d.id, d.source, d.w, if (ok) 1L else 0L)
          }
          state.update(used)
          out.iterator
      }
  }
}
