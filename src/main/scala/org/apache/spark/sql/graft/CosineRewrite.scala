package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule — the fourth Catalyst extension point this engine
  * exercises (scalar expression, aggregate, whole-operator join, and
  * now a [[Rule]]): rewrites the declarative HOF cosine composition
  *
  *   aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (s,x) => s+x)
  *     / (sqrt(aggregate(zip_with(a, a, ...), ...))
  *        * sqrt(aggregate(zip_with(b, b, ...), ...)))
  *
  * into the fused codegen [[CosineSimilarity]] expression. A user who
  * writes the textbook formula with built-in functions gets the native
  * single-loop kernel without knowing it exists — the same contract as
  * Catalyst's own rewrites. Safe because the two forms are
  * BIT-IDENTICAL for equal-length arrays (CosineExprSpec pins this;
  * the engine's embedding columns are fixed-dimension): same
  * left-to-right IEEE fold, only the execution shape changes. The
  * match is deliberately conservative — exact zero literal, exact
  * multiply/add lambda bodies, identity finish — so anything else
  * (custom seeds, finish lambdas, mismatched operands) is left alone.
  */
object CosineRewriteRule extends Rule[LogicalPlan] {

  /** aggregate(zip_with(x, y, (p,q) => p*q), 0.0, (s,v) => s+v [, id]) */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(x, y,
            LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _))
          if fin.exprId == arg.exprId =>
        Some((x, y))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
          DotFold(a, b),
          Multiply(Sqrt(DotFold(a1, a2)), Sqrt(DotFold(b1, b2)), _), _)
          if a.semanticEquals(a1) && a1.semanticEquals(a2) &&
            b.semanticEquals(b1) && b1.semanticEquals(b2) =>
        CosineSimilarity(a, b)
    }
}
