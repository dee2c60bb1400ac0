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
}
