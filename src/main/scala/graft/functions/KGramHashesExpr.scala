package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd Catalyst expression for all-positions k-gram hashing —
 * `string -> array<long>` with the exact [[TextFunctions.kGramHashes]]
 * semantics (tHash identity; see that scaladoc for when md5 grams are the
 * right tool instead). The ScalaUDF form pays an encoder/boxing round-trip
 * per row that this expression eliminates, keeping scans inside whole-stage
 * codegen; exposed as the `kgram_hashes` SQL function. The string is
 * decoded once (the hash is code-point based by contract), then the
 * O(len·k) weight loop runs on a primitive int array.
 */
case class KGramHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"need positive k, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextFunctions.kGramHashes(input.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextFunctions.kGramHashes($c.toString(), $k));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): KGramHashesExpr =
    copy(child = newChild)
}
