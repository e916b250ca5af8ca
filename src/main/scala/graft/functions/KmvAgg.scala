package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * KMV (k-minimum-values) distinct-count sketch as a typed [[Aggregator]] —
 * the classic bottom-k sketch (Bar-Yossef et al.; the base of the GB-KMV
 * containment sketch, ICDE'19): keep the k smallest DISTINCT hash values
 * seen; `k-1` divided by the k-th smallest normalized hash estimates the
 * distinct count, and fewer than k survivors IS the exact count.
 *
 * Scale shape: the buffer is bounded (≤ k Longs) and the merge is a bounded
 * sorted-merge, so Spark's partial+final aggregation shuffles at most
 * k values per (group, partition) — the raw values never shuffle, which is
 * the whole point at 100 TB. DETERMINISTIC: built over [[TextFunctions.tHash]]
 * so the sketch (and its estimate) is bit-identical across engines — the
 * house exactly-checkable-approximation contract. Estimate quality carries
 * tHash's caveat (parity-focused, not avalanche): realistic string keys
 * spread fine; adversarially regular keys bias the estimate, never the
 * determinism.
 */
class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 1, s"k must be > 1, got $k")
  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = insert(buf, x)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert)
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  /** sorted ascending, distinct, capped at k — binary search over the
    * Vector directly (no per-row array copy; this runs once per input row) */
  private def insert(buf: Seq[Long], x: Long): Seq[Long] = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val v = buf(mid)
      if (v == x) return buf // already present
      else if (v < x) lo = mid + 1
      else hi = mid
    }
    if (lo >= k) buf
    else ((buf.take(lo) :+ x) ++ buf.drop(lo)).take(k)
  }
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
