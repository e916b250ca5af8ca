package graft.plans

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.{Trigrams, TrigramTokensExpr}

/**
 * Optimizer rule: rewrite the boxed [[Trigrams.tokensUdf]] ScalaUDF into the
 * codegen'd [[TrigramTokensExpr]] — the classic `SparkSessionExtensions`
 * move: users (or third-party code) writing the convenient UDF form get the
 * whole-stage-codegen native expression automatically, with no ScalaUDF
 * encoder/boxing round-trip per row and no codegen barrier in the plan.
 *
 * Matched by the UDF's registered name ([[Trigrams.TokensUdfName]]) — one
 * argument, string-typed. Null semantics are preserved exactly: the UDF
 * returns an EMPTY array for null input (`tokenIds(null) = []`, the Scala
 * function sees the null), while the null-intolerant native expression would
 * return null — so a nullable input is wrapped in
 * `if(isnull(c), array(), trigram_tokens(c))`; a provably non-null input
 * rewrites to the bare expression. Idempotent (the rewrite emits no
 * ScalaUDF), so the optimizer's fixed-point batches converge.
 *
 * Injected by [[graft.GraftExtensions]]; plan-pinned in PlanSpec (no
 * ScalaUDF survives in the optimized plan, results bit-equal on null and
 * non-null input).
 */
case class RewriteTrigramUdf() extends Rule[LogicalPlan] {

  private val emptyIntArray =
    Literal.create(Array.empty[Int], ArrayType(IntegerType, containsNull = false))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case u: ScalaUDF
        if u.udfName.contains(Trigrams.TokensUdfName) && u.children.length == 1 &&
          u.children.head.dataType == StringType =>
      val c = u.children.head
      if (!c.nullable) TrigramTokensExpr(c)
      else If(IsNull(c), emptyIntArray, TrigramTokensExpr(c))
  }
}
