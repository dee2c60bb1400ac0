package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.CosineSimilarity

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("... cosine_similarity(a,
  * b) ...")` works in any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * public, documented injection path (no internal registry access).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes two array<double> arguments")
        CosineSimilarity(args.head, args(1))
      }))
    // the whole-operator extension: plans graft.plans.AsOf joins
    // (AsOfJoinPlan logical nodes) as the native sort-merge AsOfJoinExec
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
    // the optimizer-rule extension: users who write the textbook HOF
    // cosine composition get the fused codegen kernel transparently
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.CosineRewriteRule)
  }
}
