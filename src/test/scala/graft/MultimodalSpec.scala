package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decode stub features equal the first 8 payload bytes") {
    val rows = Multimodal.decodeFeatures(spark, sf).orderBy("media_id").limit(5)
      .collect()
    val texts = Tables.documents(spark, sf).orderBy("doc_id").limit(5)
      .select("text").collect().map(_.getString(0))
    rows.zip(texts).foreach { case (r, t) =>
      val feats = r.getAs[scala.collection.Seq[Double]]("features").toSeq
      val expect = t.getBytes("UTF-8").take(8).map(b => (b & 0xff).toDouble).toSeq
      assert(feats === expect)
      assert(r.getAs[Long]("n_bytes") === t.getBytes("UTF-8").length.toLong)
    }
  }

  test("metadata-only scan prunes the payload column from the parquet read") {
    val q = Multimodal.media(spark, sf)
      .select(col("media_id"), col("meta.origin"))
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scan.contains("content"),
      "payload bytes must not be read for metadata-only queries")
  }

  test("frame sampling emits 4 frames per media row") {
    val n = Tables.documents(spark, sf).count()
    val frames = SparkEntry.queries("mm_frame_sample")(spark, sf)
    assert(frames.count() === 4 * n)
  }
}
