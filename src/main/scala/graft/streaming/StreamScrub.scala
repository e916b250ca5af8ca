package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Streaming face of ingest-time text SCRUBBING — PII redaction + whitespace
 * canonicalization applied to every arriving document BEFORE anything
 * downstream (hashing, dedup, indexing) sees it: the production posture is
 * scrub-at-the-door, because a doc that enters the lake unscrubbed has
 * already leaked into page cache, shuffle files and operator logs.
 *
 * Like [[StreamIvfAssign]], there is no state and no watermark: the scrub is
 * a pure per-row function ([[TextFunctions.normalizeTextCol]] FIRST, then
 * [[TextFunctions.redactPiiCol]] — canonicalize-then-detect: a phone number
 * split across a newline or control character ("555\n010 0042") does not
 * match the phone pattern until whitespace collapses, so redact-first would
 * MISS it and a second pass would then catch what the first pass's
 * normalize exposed — i.e. redact-first is not even idempotent; this order
 * is, property-pinned in Round17Props), so the same transform runs
 * unchanged on a static frame or a `readStream` source. Consequences,
 * pinned the established way:
 *
 *  - BATCH ≡ STREAM: the `stream_scrub_batch` gate runs the batch face
 *    against an exact SQL oracle;
 *  - SPLIT-INVARIANCE: any micro-batch partition of the input unions to the
 *    one-shot output (`StreamReplayProps`) — no cross-batch state, so no
 *    order or boundary sensitivity.
 *
 * Output mode: Append (row-to-row map).
 */
object StreamScrub {

  /** The scrubbed text column: canonicalize whitespace, then redact
    * (URL → `<URL>`, email → `<EMAIL>`, phone → `<PHONE>`). */
  def scrubbedCol(text: Column): Column =
    TextFunctions.redactPiiCol(TextFunctions.normalizeTextCol(text))

  /** Scrub each (streaming or static) row.
    * @return (idCol, n_pii — total redacted occurrences across the three
    *         classes, clean_md5 — md5 of the scrubbed text). The count is
    *         taken on the NORMALIZED text, i.e. exactly what redaction sees
    *         (the per-doc audit trail a scrub-at-the-door pipeline logs
    *         beside the clean text). */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = TextFunctions.normalizeTextCol(col(textCol))
    df.select(col(idCol),
      (TextFunctions.matchCount(t, TextFunctions.UrlPattern) +
        TextFunctions.matchCount(t, TextFunctions.EmailPattern) +
        TextFunctions.matchCount(t, TextFunctions.PhonePattern)).as("n_pii"),
      md5(TextFunctions.redactPiiCol(t)).as("clean_md5"))
  }
}
