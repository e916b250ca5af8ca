package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd Catalyst expression for character-trigram tokenization —
 * `string -> array<int>` with the exact [[Trigrams.tokenIds]] semantics
 * (the reference's hottest loop, /root/reference/src/cossim.rs:27-60).
 *
 * vs the UDF form: stays inside whole-stage codegen (no ScalaUDF
 * encoder/boxing round-trip per row) and tokenizes the raw UTF-8 bytes without
 * decoding to String — valid because a trigram survives only if all three
 * units are in 'a'..'z', and any non-ASCII char contributes only bytes
 * ≥ 0x80, which can never be in 'a'..'z' (byte windows and char windows
 * accept exactly the same [a-z]{3} runs).
 */
case class TrigramTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_tokens requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "trigram_tokens"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Trigrams.tokenIdsBytes(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Trigrams.tokenIdsBytes($c.getBytes()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TrigramTokensExpr =
    copy(child = newChild)
}
