package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("cosine_similarity is callable from SQL in an extended session") {
    val base = TestSpark.spark
    // getOrCreate returns the active session regardless of extensions,
    // so clear it, build an extended session on the same context, and
    // restore afterwards
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // the existing SparkContext is reused automatically; only the
      // session (and its injected functions) is new
      val s = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val out = s.sql(
        """SELECT cosine_similarity(CAST(array(1.0, 0.0) AS array<double>),
          |                         CAST(array(0.0, 1.0) AS array<double>)) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(out) < 1e-12)
      val self = s.sql(
        """SELECT cosine_similarity(CAST(array(3.0, 4.0) AS array<double>),
          |                         CAST(array(3.0, 4.0) AS array<double>)) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(self - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
