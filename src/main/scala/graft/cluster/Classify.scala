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
    Q("ml_classify_eval", (s, d) => trainEval(s, d), None)
  )
}
