package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming CHUNK-level deduplication — the streaming face of
 * [[graft.operators.Dedup.chunkDedup]]'s keep-first semantics: documents
 * arrive continuously, are split into aligned `chunkWords`-word chunks
 * (identical splitter to the batch operator: lowercase `[a-z]+` runs,
 * fixed-width slices), and only the FIRST occurrence of each distinct chunk
 * ever crosses the sink. Later copies — same doc, other docs, later
 * micro-batches — are suppressed by the per-chunk-hash state bit. Downstream
 * reassembly (joining surviving chunks back per doc) is a batch concern; the
 * stream's job is the exactly-once chunk ledger.
 *
 * Within a batch the emitted occurrence is the minimum (doc_id, chunk_index)
 * — deterministic, and on a BATCH frame (each group sees all rows at once,
 * empty state) the output is exactly "every distinct chunk at its canonical
 * first occurrence", which is what the `stream_chunk_batch` gate pins against
 * the SQL oracle.
 *
 * State: one boolean per distinct chunk hash ([[StreamDedup]]'s stance);
 * `stateTtlMs > 0` bounds it with a sliding processing-time TTL at the
 * documented re-emit-past-TTL trade.
 */
object StreamChunkDedup {

  case class ChunkOcc(doc_id: Long, chunk_index: Long, chunk_hash: String)

  /** @return (doc_id, chunk_index, chunk_hash) — first-seen occurrence per
    *         distinct chunk, exactly-once across batches. */
  def firstPerChunk(docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 40, stateTtlMs: Long = 0L): Dataset[ChunkOcc] = {
    require(chunkWords > 0, s"chunkWords must be positive, got $chunkWords")
    require(stateTtlMs >= 0L, s"stateTtlMs must be >= 0, got $stateTtlMs")
    val spark = docs.sparkSession
    import spark.implicits._
    val W = chunkWords
    val chunks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)").as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST((size(__ws) + ${W - 1}) DIV $W AS INT) - 1), " +
          s"i -> array_join(slice(__ws, i * $W + 1, $W), ' '))")).as(Seq("__ci", "__chunk")))
      .select(col("doc_id"), col("__ci").cast("long").as("chunk_index"),
        md5(col("__chunk")).as("chunk_hash"))
      .as[ChunkOcc]
    val timeoutConf =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    chunks.groupByKey(_.chunk_hash)
      .flatMapGroupsWithState[Boolean, ChunkOcc](OutputMode.Append, timeoutConf) {
        (hash: String, rows: Iterator[ChunkOcc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs) // sliding
            Iterator.empty
          } else {
            var best: ChunkOcc = null
            rows.foreach { c =>
              if (best == null || c.doc_id < best.doc_id ||
                  (c.doc_id == best.doc_id && c.chunk_index < best.chunk_index))
                best = c
            }
            state.update(true)
            if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
            Iterator.single(best)
          }
      }
  }
}
