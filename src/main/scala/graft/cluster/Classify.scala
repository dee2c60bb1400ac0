package graft.cluster

import graft.{Q, Tables}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib classification over the embedding features — the supervised
  * counterpart the reference README advertises ("image classification",
  * /root/reference/README.md:1) but never implements beyond unsupervised
  * k-means. Deterministic split by key hash; multinomial logistic
  * regression on the 64-dim vectors.
  *
  * Scale: VectorUDT rows feed MLlib's own distributed LBFGS — gradient
  * aggregation is a treeAggregate (map-side partials), the standard
  * 100 TB training shape. Float reductions vary by partition order →
  * rows-only driver check; invariants asserted in ClassifySpec.
  */
object Classify {

  import Tables._

  def featurize(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("features"),
      col("label").cast("double").as("label"))

  /** Deterministic 80/20 split on the id hash, train LR, score held-out. */
  def trainEval(s: SparkSession, d: String): DataFrame = {
    val data = featurize(s, d)
    val train = data.filter(detHash(col("vec_id")) % 5 =!= 0)
    val test = data.filter(detHash(col("vec_id")) % 5 === 0)
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setFamily("multinomial")
    val model = lr.fit(train)
    val pred = model.transform(test)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(pred)
    pred.groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("prediction") === col("label"), 1).otherwise(0)).as("correct"))
      .withColumn("overall_accuracy", lit(acc))
      .orderBy("label")
  }

  val queries: Seq[Q] = Seq(
    // MLlib training is iterative + float-order-dependent → rows-only.
    Q("ml_classify_eval", (s, d) => trainEval(s, d), None),

    // ── distributed OLS (simple linear regression by sufficient stats) ─
    // Closed-form least squares of price-on-quantity per return flag —
    // the moments-based shape that scales: ONE partial-agg'd pass
    // accumulates the five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    // Σy²); slope/intercept/R² are O(1) arithmetic on the tiny result.
    // At 100 TB this is a single map-side-combined shuffle of 3 group
    // rows — the same pattern MLlib's treeAggregate runs internally,
    // expressed relationally so Catalyst codegens it. EXACTNESS: x is
    // integral quantity, y is floor(price) whole dollars, so every
    // moment is an order-free BIGINT sum (max ~3.3e15 ≪ 2^63); the
    // final formulas are one shared double expression tree over exact
    // integers → bit-identical on both engines (the evt_ema
    // convention). Denominator n·Σx²−(Σx)² > 0 whenever a group has
    // two distinct x — true by construction here.
    Q(
      "ml_linreg",
      (s, d) => {
        val m = lineitem(s, d)
          .select(col("l_returnflag").as("rf"),
            col("l_quantity").cast("long").as("x"),
            floor(col("l_extendedprice")).cast("long").as("y"))
          .groupBy("rf")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val nD = col("n").cast("double")
        def dd(c: String) = col(c).cast("double")
        val covn = nD * dd("sxy") - dd("sx") * dd("sy")
        val varxn = nD * dd("sxx") - dd("sx") * dd("sx")
        val varyn = nD * dd("syy") - dd("sy") * dd("sy")
        val slope = covn / varxn
        m.select(col("rf"), col("n"), slope.as("slope"),
            ((dd("sy") - slope * dd("sx")) / nD).as("intercept"),
            (covn * covn / (varxn * varyn)).as("r2"))
          .orderBy("rf")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             |    sum(x * x) AS sxx, sum(y * y) AS syy
             |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
             |          CAST(floor(l_extendedprice) AS BIGINT) AS y FROM lineitem)
             |  GROUP BY 1)
             |SELECT rf, n,
             |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
             |  (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE) AS intercept,
             |  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
             |FROM m ORDER BY rf""".stripMargin)
    )
  )
}
