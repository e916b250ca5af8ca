package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimExpr, TrigramTokensExpr}

/**
 * Spark extensions entry point — the idiomatic plugin form: register the
 * codegen'd expressions as native SQL functions (not ScalaUDFs), so
 * `spark.sql("SELECT trigram_tokens(s), cosine_sim(a, b) ...")` stays inside
 * whole-stage codegen with strict type checking.
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
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim takes exactly two arguments")
        CosineSimExpr(exprs.head, exprs(1))
      }))
    // UDF-to-native rewrite: plans written with the boxed Trigrams.tokensUdf
    // get the codegen'd TrigramTokensExpr automatically (null-exact).
    ext.injectOptimizerRule(_ => graft.plans.RewriteTrigramUdf())
    // custom whole-operator path: SimKernelJoin logical node -> SimKernelExec
    ext.injectPlannerStrategy(_ => graft.plans.SimKernelStrategy)
  }
}
