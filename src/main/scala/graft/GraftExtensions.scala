package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.TrigramTokensExpr

/**
 * Spark extensions entry point — the idiomatic plugin form: register the
 * codegen'd trigram expression as a native SQL function (not a ScalaUDF), so
 * `spark.sql("SELECT trigram_tokens(s) ...")` stays inside whole-stage codegen
 * with strict type checking.
 *
 * Activate per session:
 *   SparkSession.builder().config("spark.sql.extensions", "graft.GraftExtensions")
 * or `.withExtensions(new GraftExtensions)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("trigram_tokens"),
      new ExpressionInfo(classOf[TrigramTokensExpr].getName, "trigram_tokens"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "trigram_tokens takes exactly one argument")
        TrigramTokensExpr(exprs.head)
      }))
  }
}
