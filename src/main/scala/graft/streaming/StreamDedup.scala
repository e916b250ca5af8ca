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
 * At 100 TB-stream scale the state store holds ONE boolean per distinct hash.
 * By default (`stateTtlMs = 0`, `NoTimeout`) state grows with distinct hashes
 * forever — the exactly-once contract stays visible in tests. Pass
 * `stateTtlMs > 0` to bound it with `ProcessingTimeTimeout`: a hash unseen
 * for the TTL has its state evicted, so a LATER duplicate re-emits (the
 * documented at-most-once-per-TTL-window trade — pair with a re-emit-tolerant
 * sink). The TTL is SLIDING: every sighting of the hash refreshes it, so only
 * hashes quiet for a full TTL window are evicted.
 *
 * Works identically on a batch Dataset (each group sees all its rows in one
 * invocation with empty state → emits exactly the min id per hash =
 * Dedup.exact's canonical rows; processing-time timeouts never fire in batch).
 */
object StreamDedup {

  case class Hashed(doc_id: Long, content_hash: String)
  case class Canonical(doc_id: Long, content_hash: String)

  /** @param stateTtlMs 0 (default) = NoTimeout exact contract; > 0 = evict a
    *        hash's state after that many ms without a sighting (re-emits on
    *        re-sight past the TTL).
    * @return (doc_id, content_hash) — first-seen document per content hash. */
  def firstPerHash(docs: DataFrame, idCol: String, textCol: String,
      stateTtlMs: Long = 0L): Dataset[Canonical] = {
    require(stateTtlMs >= 0L, s"stateTtlMs must be >= 0, got $stateTtlMs")
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col(idCol).cast("long").as("doc_id"), md5(col(textCol)).as("content_hash"))
      .as[Hashed]
    val timeoutConf =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    hashed.groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, Canonical](OutputMode.Append, timeoutConf) {
        (hash: String, rows: Iterator[Hashed], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // timeout invocation carries no rows: evict so the next sighting
            // of this hash re-emits
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs) // sliding
            Iterator.empty
          } else {
            var minId = Long.MaxValue
            rows.foreach(h => if (h.doc_id < minId) minId = h.doc_id)
            state.update(true)
            if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
            Iterator.single(Canonical(minId, hash))
          }
      }
  }
}
