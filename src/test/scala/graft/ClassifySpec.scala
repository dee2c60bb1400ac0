package graft

import graft.cluster.Classify

class ClassifySpec extends SparkSpec {

  test("train/eval runs end-to-end with a deterministic split") {
    val out = Classify.trainEval(spark, sf).collect()
    assert(out.nonEmpty)
    val acc = out.head.getAs[Double]("overall_accuracy")
    assert(acc >= 0.0 && acc <= 1.0)
    // per-label correct counts never exceed totals
    out.foreach { r =>
      assert(r.getAs[Long]("correct") <= r.getAs[Long]("n"))
    }
  }

  test("featurize keeps one row per embedding with a 64-dim vector") {
    val f = Classify.featurize(spark, sf)
    assert(f.count() === Tables.embeddings(spark, sf).count())
    val v = f.head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    assert(v.size === 64)
  }
}
