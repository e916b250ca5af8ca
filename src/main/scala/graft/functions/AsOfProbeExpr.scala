package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * Driver-built probe table for [[AsOfProbeExpr]]: per key (a CATALYST value —
 * UTF8String for strings, boxed primitives for numerics, so executor-side
 * probes hash/equal correctly), the right rows sorted by (ts, tie) ascending:
 * the ts Longs for binary search and, index-aligned, the result structs
 * already in output layout (payload values ++ matched_ts) as InternalRows.
 */
final case class AsOfProbeTable(
    byKey: Map[Any, (Array[Long], Array[InternalRow])]) extends Serializable

/**
 * The columnar probe of [[graft.operators.AsOfJoin.asofJoinBroadcast]]: given
 * the left key and (long) timestamp, binary-search the broadcast per-key
 * sorted arrays and return the matched result struct (payload ++ matched_ts),
 * or null when no row matches the direction/tolerance. Keeping the probe an
 * EXPRESSION keeps the (huge, by this operator's premise) left side in
 * Tungsten format — no `left.rdd` deserialization of every row to external
 * `Row`s; only the two child columns are evaluated per input row.
 * `CodegenFallback` is deliberate: the probe is a hash lookup + binary search
 * per row, where generated code buys little over the eval path, and the scan
 * stays inside the Dataset plan either way.
 *
 * Match semantics are exactly the shuffle path's (and the old RDD probe's):
 * backward = greatest ts ≤ t, forward = smallest ts ≥ t (largest tie within
 * a ts group wins — the arrays are (ts, tie)-sorted and the search takes the
 * group's last element), nearest = closer of the two (ties → backward);
 * `tolerance` > 0 rejects matches with |t − matched| > tolerance. Null key
 * or ts → null (BinaryExpression null intolerance).
 */
case class AsOfProbeExpr(
    key: Expression, ts: Expression,
    bc: Broadcast[AsOfProbeTable],
    resultType: StructType,
    direction: String, tolerance: Long)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = key
  override def right: Expression = ts
  override def dataType: DataType = resultType
  override def nullable: Boolean = true
  override def prettyName: String = "asof_probe"

  private val bwd = direction == "backward" || direction == "nearest"
  private val fwd = direction == "forward" || direction == "nearest"

  override def nullSafeEval(k: Any, t0: Any): Any = {
    val t = t0.asInstanceOf[Long]
    bc.value.byKey.get(k) match {
      case None => null
      case Some((tsArr, rows)) =>
        // upper bound: first index with ts > t
        var lo = 0; var hi = tsArr.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (tsArr(mid) <= t) lo = mid + 1 else hi = mid
        }
        val bIdx = if (bwd && lo > 0) lo - 1 else -1
        var fIdx = -1
        if (fwd) {
          // lower bound: first index with ts >= t
          var lo2 = 0; var hi2 = tsArr.length
          while (lo2 < hi2) {
            val mid = (lo2 + hi2) >>> 1
            if (tsArr(mid) < t) lo2 = mid + 1 else hi2 = mid
          }
          if (lo2 < tsArr.length) {
            val v = tsArr(lo2) // last element of the ts == v group
            var j = lo2
            while (j + 1 < tsArr.length && tsArr(j + 1) == v) j += 1
            fIdx = j
          }
        }
        val pick = direction match {
          case "backward" => bIdx
          case "forward"  => fIdx
          case _ => // nearest; equal distance → backward
            if (bIdx >= 0 && fIdx >= 0) {
              if (t - tsArr(bIdx) <= tsArr(fIdx) - t) bIdx else fIdx
            } else if (bIdx >= 0) bIdx else fIdx
        }
        if (pick < 0) null
        else if (tolerance != 0L && math.abs(t - tsArr(pick)) > tolerance) null
        else rows(pick)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfProbeExpr =
    copy(key = newLeft, ts = newRight)
}
