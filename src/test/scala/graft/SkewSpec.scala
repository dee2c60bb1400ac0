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

  test("AQE skew-join splits the hot partition automatically (no manual salt)") {
    import spark.implicits._
    // The automatic counterpart to the manual salting above: with
    // adaptive skew-join handling on, the runtime detects the oversized
    // shuffle partition from map-output sizes and splits it into
    // advisory-sized sub-reads, so a hot join key stops being a
    // straggler WITHOUT query rewrites. Thresholds are scaled down to
    // test size (the production defaults fire at 256 MB); the plan
    // assertion is the point — the SMJ must report skew=true.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // hub-heavy fact side: 95% of rows hit key 0; dimension side flat
      val rng = new scala.util.Random(11)
      val fact = (1 to 60000).map { i =>
        val k = if (rng.nextDouble() < 0.95) 0L else (rng.nextInt(50) + 1).toLong
        (k, s"payload_${i}_${"x" * 32}")
      }.toDF("k", "v")
      val dim = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")

      val joined = fact.join(dim, "k")
      // materialize THIS Dataset's QueryExecution (count() would build
      // its own), so the adaptive plan below is the final executed one
      assert(joined.collect().length === 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition's sort-merge join skew=true:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
