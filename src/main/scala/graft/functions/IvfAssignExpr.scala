package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Columnar IVF coarse-quantizer probe — the
 * [[graft.operators.SimSearch.ivfAssign]] kernel as a Catalyst expression
 * over the broadcast centroid array (the [[AsOfProbeExpr]] treatment): the
 * batch scan stays a Dataset plan end to end instead of exiting Tungsten
 * through `rdd.mapPartitions` (no per-row deserialization to external
 * `Row`s), which also makes the operator usable on STREAMING frames — a
 * stateless projection is exactly what a stream-static assignment is.
 * `CodegenFallback` is deliberate, as in [[AsOfProbeExpr]]: the per-row work
 * is nList·dim multiply-adds on a broadcast model where generated code buys
 * little; keeping the scan inside the Dataset plan is the win.
 *
 * Arithmetic mirrors `SimSearch.ivfCentroidCos`/`ivfNearest` BIT-FOR-BIT
 * (d-ascending Double dot folds, cos = dot/(‖v‖·‖c‖), dimension mismatch →
 * −∞, argmax ties keep the smaller index, cos_micro = floor(cos·10⁶) as
 * Long) so the expression path reproduces the former RDD path's hashes
 * exactly. Null array, zero-norm vector, or an array containing null
 * elements → null struct (the shared eligibility contract; callers filter).
 *
 * @return struct(list: int, cos_micro: long), or null for ineligible rows.
 */
case class IvfAssignExpr(
    vec: Expression,
    bc: Broadcast[Array[(Array[Double], Double)]])
  extends UnaryExpression with CodegenFallback {

  override def child: Expression = vec
  override def dataType: DataType = StructType(Seq(
    StructField("list", IntegerType), StructField("cos_micro", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_assign"

  override def nullSafeEval(v0: Any): Any = {
    val a = v0.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val v = new Array[Float](n)
    var norm2 = 0.0
    i = 0
    while (i < n) {
      val x = a.getFloat(i)
      v(i) = x
      norm2 += x.toDouble * x.toDouble
      i += 1
    }
    if (norm2 == 0.0) return null
    val vNorm = math.sqrt(norm2)
    val cents = bc.value
    var best = 0
    var bestCos = Double.NegativeInfinity
    var first = true
    var j = 0
    while (j < cents.length) {
      val (cv, cn) = cents(j)
      val cos =
        if (cv.length != n) Double.NegativeInfinity
        else {
          var dot = 0.0; var d = 0
          while (d < n) { dot += v(d).toDouble * cv(d); d += 1 }
          dot / (vNorm * cn)
        }
      // strict > only replaces — ties keep the smaller index (ivfNearest)
      if (first || cos > bestCos) { best = j; bestCos = cos; first = false }
      j += 1
    }
    new GenericInternalRow(Array[Any](best, math.floor(bestCos * 1000000.0).toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssignExpr =
    copy(vec = newChild)
}
