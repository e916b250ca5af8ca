package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Driver-built probe table for [[IntervalProbeExpr]]: per key (Catalyst
 * values), the intervals sorted by start — `starts`, the inclusive `ends`,
 * `prefixMaxEnd(i)` = max of ends(0..i) (the augmented-array early-stop for
 * the backward candidate scan), and the index-aligned interval payload rows
 * (the interval's non-key output columns as InternalRows).
 */
final case class IntervalProbeTable(
    byKey: Map[Any, (Array[Long], Array[Long], Array[Long], Array[InternalRow])])
  extends Serializable

/**
 * Columnar probe of [[graft.operators.IntervalJoin.pointInIntervalBroadcast]]:
 * given the point's key and (long) value, return the ARRAY of broadcast
 * intervals containing it (empty → the explode above drops the point, the
 * inner-join contract). Candidates are found by binary search on the sorted
 * starts (first index with start > t, scanning backward) and the scan stops
 * as soon as `prefixMaxEnd` falls below t — so a probe costs O(log n +
 * matches) instead of O(n). Keeping the probe an expression keeps the huge
 * point side in Tungsten format, exactly the [[AsOfProbeExpr]] argument.
 */
case class IntervalProbeExpr(
    key: Expression, point: Expression,
    bc: Broadcast[IntervalProbeTable],
    elementType: StructType)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = key
  override def right: Expression = point
  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "interval_probe"

  override def nullSafeEval(k: Any, t0: Any): Any = {
    val t = t0.asInstanceOf[Long]
    bc.value.byKey.get(k) match {
      case None => new GenericArrayData(Array.empty[Any])
      case Some((starts, ends, prefixMax, rows)) =>
        // upper bound: first index with start > t
        var lo = 0; var hi = starts.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (starts(mid) <= t) lo = mid + 1 else hi = mid
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[Any]
        var i = lo - 1
        while (i >= 0 && prefixMax(i) >= t) {
          if (ends(i) >= t) out += rows(i)
          i -= 1
        }
        new GenericArrayData(out.reverseIterator.toArray) // start-ascending
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntervalProbeExpr =
    copy(key = newLeft, point = newRight)
}
