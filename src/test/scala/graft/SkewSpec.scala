package graft

import org.apache.spark.sql.functions._

/** Skew-handling pattern: salting a hot key. With one key carrying most
  * rows, a plain groupBy puts the whole hot key in one task; salting
  * spreads partial aggregation over N subkeys and recombines — the
  * two-level shape that keeps 100 TB aggregations off a single straggler
  * (AQE skew-join handles the join case automatically; aggregation salt
  * remains a pattern the engine's users need). */
class SkewSpec extends SparkSpec {

  test("salted two-level aggregation equals the direct aggregation on skewed data") {
    import spark.implicits._
    // 90% of rows share key 0
    val rng = new scala.util.Random(7)
    val data = (1 to 20000).map { i =>
      val k = if (rng.nextDouble() < 0.9) 0L else rng.nextInt(100).toLong
      (k, rng.nextInt(1000).toLong)
    }
    val df = data.toDF("k", "v")

    val direct = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("cnt"))

    val salt = 16
    val salted = df
      .withColumn("salt", pmod(hash(col("v")), lit(salt)))
      .groupBy("k", "salt")
      .agg(sum("v").as("ptotal"), count(lit(1)).as("pcnt"))
      .groupBy("k")
      .agg(sum("ptotal").as("total"), sum("pcnt").as("cnt"))

    val d = direct.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sm = salted.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d === sm)
    // and the hot key really was spread across salt subkeys
    val hotParts = df.withColumn("salt", pmod(hash(col("v")), lit(salt)))
      .filter(col("k") === 0L).select("salt").distinct().count()
    assert(hotParts > salt / 2, s"hot key only hit $hotParts of $salt salts")
  }

  test("salted common-neighbors equals the direct count and hash-partitions both stages") {
    import spark.implicits._
    // hub-heavy corpus: every supplier supplies part 999 (hub degree
    // 60 → 1770 pairs all sharing it), plus a sparse unique tail
    val hub = (1L to 60L).map(s => (s, 999L))
    val tail = (1L to 60L).map(s => (s, s % 7))
    val es = (hub ++ tail).distinct.toDF("src", "dst")

    val direct = es.toDF("sa", "dst").join(es.toDF("sb", "dst2"),
        col("dst") === col("dst2")).filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("shared_parts"))
    val salted = graph.PropertyGraph.commonNeighborsSalted(es)

    val d = direct.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sm = salted.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d === sm, "salted two-stage count must equal the direct groupBy")

    // both aggregation stages shuffle by hash partitioning: the partial
    // on (sa, sb, salt) — spreading the hub pairs — then the final on
    // (sa, sb). (Unwrap AQE; attribute ids vary, so match by prefix.)
    val plan = salted.queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\(sa#\\d+L?, sb#\\d+L?(, salt#\\d+)?".r
      .findAllIn(plan).toList
    assert(parts.exists(_.contains("salt")),
      s"partial stage must hash-partition on (sa, sb, salt):\n$plan")
    assert(parts.exists(!_.contains("salt")),
      s"final stage must hash-partition on (sa, sb):\n$plan")
  }
}
