package graft

import graft.ops.{Vector => V}
import org.apache.spark.sql.functions._

class CosineExprSpec extends SparkSpec {

  test("native expression is bit-identical to the HOF composition on real data") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0L)
      .select(V.vec(col("embedding")).as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        V.cosine(V.vec(col("embedding")), col("qv")).as("native"),
        V.cosineHof(V.vec(col("embedding")), col("qv")).as("hof"))
    // bit-identity, not epsilon: same fold order by construction
    val diff = both.filter(col("native") =!= col("hof")).count()
    assert(diff === 0)
  }

  test("native expression participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
    val v = V.vec(col("embedding"))
    val plan = e.select(V.cosine(v, v).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"plan lacks codegen:\n$plan")
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val out = df.select(V.cosine(col("a"), col("b")).as("c")).head()
    assert(out.isNullAt(0))
  }

  test("optimizer rule rewrites the HOF composition to the native expression") {
    import org.apache.spark.sql.graft.{CosineRewriteRule, CosineSimilarity}
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0L)
      .select(V.vec(col("embedding")).as("qv"))
    def hofQuery = e.crossJoin(broadcast(q))
      .select(col("vec_id"), V.cosineHof(V.vec(col("embedding")), col("qv")).as("c"))
      .orderBy("vec_id")
    val baseline = hofQuery.collect() // rule OFF: pure HOF plan
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ CosineRewriteRule
      val rewritten = hofQuery
      val opt = rewritten.queryExecution.optimizedPlan
      def has(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
              pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean) =
        p.exists(_.expressions.exists(_.exists(pred)))
      assert(has(opt, _.isInstanceOf[CosineSimilarity]),
        s"rule must plant the native expression:\n$opt")
      assert(!has(opt,
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate]),
        "no HOF fold should survive the rewrite")
      // bit-identity with the un-rewritten run, row for row
      assert(rewritten.collect().toSeq === baseline.toSeq)
      // conservative match: a different seed is NOT the cosine shape —
      // the fold must be left alone
      val seeded = e.select(aggregate(
          zip_with(V.vec(col("embedding")), V.vec(col("embedding")), (x, y) => x * y),
          lit(1.0), (s, x) => s + x).as("notcos"))
      assert(has(seeded.queryExecution.optimizedPlan,
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate]),
        "non-cosine folds must survive untouched")
    } finally spark.experimental.extraOptimizations = prev
  }
}
