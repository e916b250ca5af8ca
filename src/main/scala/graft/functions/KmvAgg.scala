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
  /** sorted ascending, distinct, capped at k */
  private def insert(buf: Seq[Long], x: Long): Seq[Long] = {
    val i = java.util.Arrays.binarySearch(buf.toArray, x)
    if (i >= 0) buf // already present
    else {
      val at = -i - 1
      if (at >= k) buf
      else ((buf.take(at) :+ x) ++ buf.drop(at)).take(k)
    }
  }
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
