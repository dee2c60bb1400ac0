package graft

import graft.ops.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  import spark.implicits._

  test("minhash signatures of near-duplicate docs mostly agree") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val c = "completely different content with no shared shingles at all whatsoever here"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .select(col("doc_id"), Text.minhashSig(Text.tokens(col("text"))).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getAs[Seq[Long]]("sig")).toMap
    val agreeAB = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }
    val agreeAC = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y }
    assert(agreeAB >= 5, s"near-dups should share most minhashes, got $agreeAB/8")
    assert(agreeAC <= 2, s"unrelated docs should share few minhashes, got $agreeAC/8")
  }

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val groups = df.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"))
      .collect().map(r => r.getAs[Long]("keeper") -> r.getAs[Long]("copies")).toMap
    assert(groups(1L) === 2L)
    assert(groups(3L) === 1L)
  }

  test("langid prefers the language whose markers dominate") {
    val df = Seq(
      (1L, "der hund und die katze und der vogel"),
      (2L, "the cat and the dog of the house"),
      (3L, "le chat et les chiens des villes le matin")
    ).toDF("doc_id", "text")
    // assert via the marker scores the query's CASE chain is built from
    val t = Text.tokens(col("text"))
    def score(ws: Seq[String]) =
      size(filter(t, x => array_contains(array(ws.map(lit): _*), x)))
    val scored = df.select(col("doc_id"),
      score(Seq("der", "und", "die")).as("de"),
      score(Seq("the", "and", "of")).as("en"),
      score(Seq("le", "les", "des")).as("fr")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(scored(1L)._1 > scored(1L)._2 && scored(1L)._1 > scored(1L)._3)
    assert(scored(2L)._2 > scored(2L)._1)
    assert(scored(3L)._3 > scored(3L)._1)
  }

  test("rolling-hash fingerprint is order-sensitive and deterministic") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val codes = transform(Text.tokens(col("text")),
      w => length(w).cast("long") * 256 + ascii(substring(w, 1, 1)))
    val fp = aggregate(codes, lit(0L), (h, c) => (h * 1000003L + c) % 2147483647L)
    val out = df.select(col("doc_id"), fp.as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === out(3L))
    assert(out(1L) !== out(2L))
  }

  test("simhash hamming distance separates similar from dissimilar") {
    def simhash(df: org.apache.spark.sql.DataFrame) = {
      val t = Text.tokens(col("text"))
      val hs = transform(t, w => Text.strHash(w) % 65536L)
      val bits = (0 until 16).map { i =>
        val vote = aggregate(hs, lit(0L),
          (acc, h) => acc + when(shiftright(h, i) % 2 === 1, 1L).otherwise(-1L))
        when(vote > 0, 1L << i).otherwise(0L)
      }
      df.select(col("doc_id"), bits.reduce(_ + _).as("sh")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val m = simhash(Seq(
      (1L, "spark query engine with fast columnar scans and joins"),
      (2L, "spark query engine with fast columnar scans and filters"),
      (3L, "entirely unrelated musical composition about summer rain")
    ).toDF("doc_id", "text"))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
  }
}
