package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Data-layout scale evidence: the cluster-side techniques that keep a
  * 100 TB job off the shuffle wire — bucketed co-located joins,
  * partition pruning at the scan, and salted two-stage aggregation —
  * demonstrated against the physical plan, not described in prose. */
class ScaleSpec extends SparkSpec {

  /** Final (post-AQE) physical plan string. */
  private def finalPlan(df: DataFrame): String = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case o => o.toString
    }
  }

  test("bucketed tables co-locate their join and aggregation: zero shuffles") {
    val tmp = tempDir("graft-bucketed")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/bo").saveAsTable("bucketed_orders")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/bl").saveAsTable("bucketed_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // join on the bucket key, then aggregate by it: both the join and
      // the aggregation are satisfied by the on-disk hashpartitioning,
      // so the whole query runs without a single Exchange. This is the
      // write-once-join-many layout for 100 TB fact tables.
      val joined = spark.table("bucketed_orders")
        .join(spark.table("bucketed_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      joined.collect()
      val p = finalPlan(joined)
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join+agg must not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scan should be bucket-aware:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bucketed_orders")
      spark.sql("DROP TABLE IF EXISTS bucketed_lineitem")
    }
  }

  test("hive-style partitioned layout prunes partitions at the scan") {
    val tmp = tempDir("graft-part")
    Tables.orders(spark, sf)
      .withColumn("o_prio", substring(col("o_orderpriority"), 1, 1))
      .write.mode("overwrite").partitionBy("o_prio").parquet(tmp)
    val rd = spark.read.parquet(tmp).filter(col("o_prio") === "1")
      .select(count(lit(1)).as("cnt"))
    rd.collect()
    val p = finalPlan(rd)
    // the partition predicate must be a PartitionFilter (directory
    // pruning — only 1 of 5 partition dirs listed), not a row filter.
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*o_prio[^\\]]*\\].*"),
      s"o_prio filter should prune partitions at the scan:\n$p")
  }

  test("IVF-cell-partitioned embedding store: an nprobe scan prunes to the probed cells") {
    // substantiates the ANN family's standing scale claim: "at 100 TB
    // the corpus is written partitioned by cell, so a probe is a
    // partition-pruned read, not a scan". Write the sf0.001 assignment
    // once (cid = nearest of the 8 deterministic centroids), read back
    // with an nprobe=2 cell filter, and require directory-level
    // PartitionFilters — plus result equality with the in-memory
    // filter, so pruning provably drops no candidate.
    val tmp = tempDir("graft-ivf")
    val e = Tables.embeddings(spark, sf)
    val assigned = cluster.KMeans.assign(e, cluster.KMeans.initCentroids(e, 8))
      .select(col("vec_id"), col("cid"), col("sim"))
    assigned.write.mode("overwrite").partitionBy("cid").parquet(tmp)
    val cells = new java.io.File(tmp).listFiles().count(_.getName.startsWith("cid="))
    assert(cells == 8, s"expected 8 cell directories, got $cells")
    val probe = assigned.select(col("cid")).distinct()
      .orderBy("cid").limit(2).collect().map(_.getLong(0))
    val rd = spark.read.parquet(tmp)
      .filter(col("cid").isin(probe.toIndexedSeq: _*))
    rd.collect()
    val p = finalPlan(rd)
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*cid[^\\]]*\\].*"),
      s"cid probe filter must prune cell directories at the scan:\n$p")
    val got = rd.select("vec_id").collect().map(_.getLong(0)).toSet
    val want = assigned.filter(col("cid").isin(probe.toIndexedSeq: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === want, "pruned read must return exactly the probed cells' vectors")
  }

  test("shuffle-hash-join hint switches the join strategy (no sort at 100 TB)") {
    // The third strategy in the 100 TB join toolbox: when both sides
    // are large but one fits a task's memory per partition, SHJ skips
    // the SMJ sort entirely. The hint is honored per-join.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sf).select("o_orderkey").hint("shuffle_hash")
      val p = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"), s"hint should pick SHJ:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("range-partitioned sorted write yields disjoint per-file key ranges") {
    // The write layout that makes 100 TB scans prunable: global range
    // partitioning + within-partition sort ⇒ every file owns a disjoint
    // key interval, so parquet row-group stats (and any min/max file
    // index) eliminate files for point/range predicates.
    val tmp = tempDir("graft-range")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(tmp)
    val files = new java.io.File(tmp).listFiles
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 2, s"expected multiple range files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.toList.sliding(2).foreach {
      case List((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"file ranges overlap: hi=$hiA lo=$loB in ${ranges.toList}")
      case _ => ()
    }
  }

  test("z-order layout clusters BOTH dims; single-key sort cannot") {
    // The multi-dimensional skipping argument, measured: orders written
    // range-partitioned by custkey alone vs by the Morton key of
    // (custkey, order-day). Per-file min/max day spans tell a scan
    // filtered on day how many files it can skip — under the custkey
    // layout every file spans ~the whole date range (no skipping);
    // under z-order each file owns a fraction of BOTH dimensions.
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
      .withColumn("zkey",
        graft.ops.Extended.zOrderKey(col("o_custkey") % 65536, col("day") % 65536))
    def avgDaySpanFrac(dir: String): Double = {
      val files = new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length >= 4, s"expected >=4 files in $dir")
      val (glo, ghi) = {
        val r = spark.read.parquet(dir).agg(min("day"), max("day")).head
        (r.getLong(0), r.getLong(1))
      }
      val fracs = files.map { f =>
        val r = spark.read.parquet(f).agg(min("day"), max("day")).head
        (r.getLong(1) - r.getLong(0)).toDouble / (ghi - glo)
      }
      fracs.sum / fracs.length
    }
    val tmp = tempDir("graft-zorder")
    src.repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/bykey")
    src.repartitionByRange(8, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$tmp/byz")
    val keyFrac = avgDaySpanFrac(s"$tmp/bykey")
    val zFrac = avgDaySpanFrac(s"$tmp/byz")
    // custkey order is independent of date: every file spans ~all days
    assert(keyFrac > 0.8, s"custkey layout should not cluster days: $keyFrac")
    // z-order gives each file a bounded slice of the day dimension too
    assert(zFrac < 0.6 * keyFrac,
      s"z-order must shrink per-file day spans: z=$zFrac vs key=$keyFrac")
  }

  test("small-files compaction: many tiny files → few sized files, content-exact") {
    // the 100 TB maintenance op streaming/incremental sinks make
    // necessary: a directory of tiny files (one per micro-batch) is
    // compacted to a handful of target-sized files — fewer tasks, fewer
    // namenode entries, full row fidelity. maxRecordsPerFile bounds the
    // file size from above; repartition sets the parallelism floor.
    val tmp = tempDir("graft-compact")
    val src = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    src.repartition(64).write.mode("overwrite").parquet(s"$tmp/small")
    def parquetFiles(p: String) = new java.io.File(p).listFiles
      .count(_.getName.endsWith(".parquet"))
    val before = parquetFiles(s"$tmp/small")
    assert(before >= 32, s"fixture must fragment: $before files")
    spark.read.parquet(s"$tmp/small")
      .repartition(2)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000000)
      .parquet(s"$tmp/compact")
    val after = parquetFiles(s"$tmp/compact")
    assert(after <= 4, s"compaction must collapse the file count: $after")
    // content equality: same keys, same checksum of prices
    val a = spark.read.parquet(s"$tmp/small")
      .agg(count(lit(1)), sum("o_orderkey"), sum(Tables.dec(col("o_totalprice")))).head
    val b = spark.read.parquet(s"$tmp/compact")
      .agg(count(lit(1)), sum("o_orderkey"), sum(Tables.dec(col("o_totalprice")))).head
    assert(a === b, "compaction must preserve every row")
  }

  test("schema evolution: mergeSchema unifies drifted parquet generations") {
    // A 100 TB table is written over years by drifting jobs; readers
    // must union generations without rewrites. Two generations with
    // disjoint new columns merge into one schema, absent columns null.
    val tmp = tempDir("graft-drift")
    spark.range(5).select(col("id"), lit(1.0).as("v1"))
      .write.parquet(s"$tmp/g=1")
    spark.range(5).select(col("id"), lit("x").as("v2"))
      .write.parquet(s"$tmp/g=2")
    val df = spark.read.option("mergeSchema", "true").parquet(tmp)
    assert(df.columns.toSet === Set("id", "v1", "v2", "g"))
    assert(df.filter(col("v2").isNull).count() === 5L)
    assert(df.filter(col("v1").isNull).count() === 5L)
  }

  test("salted aggregation plans two distinct hash-partition stages") {
    val p = finalPlan(SparkEntry.queries("rel_skew_salted_agg")(spark, sf))
    assert(p.matches("(?s).*hashpartitioning\\(l_returnflag#\\d+, salt#\\d+.*"),
      s"stage 1 must shard the hot key by salt:\n$p")
    assert(p.matches("(?s).*hashpartitioning\\(l_returnflag#\\d+, \\d+\\).*"),
      s"stage 2 must re-aggregate per key:\n$p")
  }

  test("observe() collects pipeline metrics in the same pass as the job") {
    // The 100 TB metrics pattern: data-quality counters ride the main
    // job's single scan (an AggregatingAccumulator on the executors)
    // instead of a second pass over the corpus. Here the dedup filter
    // pipeline reports rows seen / empty texts / total chars while its
    // real output materializes once.
    val obs = new org.apache.spark.sql.Observation("corpus_quality")
    val out = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("empty_texts"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .filter(length(col("text")) > 0)
      .count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] === 500L)
    assert(m("empty_texts").asInstanceOf[Long] === 0L)
    assert(m("total_chars").asInstanceOf[Long] > 0L)
    assert(out === 500L)
  }

  test("runtime bloom filter prunes the fact scan from a selective dimension") {
    // Runtime row-level filtering: when a shuffle join's build side is
    // small and selective, Catalyst injects a bloom-filter aggregate on
    // it and a might_contain probe INTO THE FACT SCAN's filters — at
    // 100 TB this drops non-joining rows at the source instead of
    // carrying them to the shuffle. Thresholds scaled to test size
    // (production defaults fire at 10 MB build / 10 GB probe).
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join, not broadcast
      val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val dim = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 100000.0) // selective build side
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") && optimized.contains("might_contain"),
        s"optimizer must inject the bloom build + probe:\n$optimized")
      // and the probe really lands on the fact side's scan subtree
      assert(joined.count() > 0L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
