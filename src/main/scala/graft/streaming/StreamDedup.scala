package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming exact deduplication with EXPLICIT keyed state — the
 * `KeyValueGroupedDataset.flatMapGroupsWithState` surface of the pipeline
 * brief: a continuously-arriving corpus is deduplicated by content hash, and
 * only the FIRST document per hash ever crosses the sink (later arrivals are
 * dropped by the per-hash state bit).
 *
 * Semantics: per micro-batch, a hash whose state is still empty emits the
 * minimum doc id among that batch's rows (deterministic within a batch) and
 * sets the state; a hash with state set emits nothing. This is the streaming
 * face of [[graft.operators.Dedup.exact]]'s canonical-id contract: the first
 * batch containing a hash decides its canonical document.
 *
 * At 100 TB-stream scale the state store holds ONE boolean per distinct hash —
 * bound it in production with `GroupStateTimeout.ProcessingTimeTimeout` + a
 * re-emit-tolerant sink, or periodic state snapshots to a compaction job; the
 * operator keeps `NoTimeout` so the exactly-once contract is visible in tests.
 *
 * Works identically on a batch Dataset (each group sees all its rows in one
 * invocation with empty state → emits exactly the min id per hash =
 * Dedup.exact's canonical rows).
 */
object StreamDedup {

  case class Hashed(doc_id: Long, content_hash: String)
  case class Canonical(doc_id: Long, content_hash: String)

  /** @return (doc_id, content_hash) — first-seen document per content hash. */
  def firstPerHash(docs: DataFrame, idCol: String, textCol: String): Dataset[Canonical] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col(idCol).cast("long").as("doc_id"), md5(col(textCol)).as("content_hash"))
      .as[Hashed]
    hashed.groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, Canonical](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, rows: Iterator[Hashed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            var minId = Long.MaxValue
            rows.foreach(h => if (h.doc_id < minId) minId = h.doc_id)
            state.update(true)
            Iterator.single(Canonical(minId, hash))
          }
      }
  }
}
