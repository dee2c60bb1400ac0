package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GenSnap

/** Pins the r13 generalization of the Borůvka originStats finding
  * (VERDICT r12 task 3): every driver-counted fixpoint kernel snapshots
  * its generations through [[GenSnap.snap]], whose contract is
  *
  *  1. the carried stats estimate never exceeds the cap, no matter how
  *     many self-joining generations compound it (uncapped, sizeInBytes
  *     SQUARES per generation and the planner multiplies million-digit
  *     BigInts — the measured 40 s Borůvka driver burn);
  *  2. the capped re-wrap reuses the checkpointed RDD verbatim — no
  *     InternalRow→Row round-trip (the round-12 createDataFrame fix
  *     paid one);
  *  3. below the cap the frame is untouched — honest small-frame
  *     estimates (and broadcast eligibility) are preserved.
  */
class GenSnapSpec extends SparkSpec {
  import org.apache.spark.sql.execution.LogicalRDD

  private def leafStats(df: DataFrame): BigInt =
    df.queryExecution.logical.collectFirst {
      case lr: LogicalRDD => lr.stats.sizeInBytes
    }.getOrElse(fail("expected a LogicalRDD leaf after snap"))

  /** One squaring generation: join the checkpointed frame against a
    * renamed view of ITSELF on a key the planner can no longer prove
    * distinct — a LogicalRDD leaf carries no distinctKeys, so Spark 4's
    * visitJoin falls through its sum-of-sides fast path to the PRODUCT
    * default. This is exactly Borůvka's pointer-jump shape
    * (`par ⋈ par` on p = pc). Keys are unique in the DATA (k = id), so
    * rows stay constant while the estimate squares. */
  private def squaringStep(gen: DataFrame): DataFrame =
    GenSnap.snap(
      gen.join(gen.select(col("k"), col("id").as("id2")), "k")
        .select(col("id"), col("k")))

  test("self-joining generations keep capped, constant-size stats") {
    val base = spark.range(1000)
      .select(col("id"), col("id").as("k"))
      .repartition(col("k"))
    var gen = GenSnap.snap(base.toDF())
    var prev = BigInt(-1)
    for (round <- 1 to 10) {
      gen = squaringStep(gen)
      val s = leafStats(gen)
      assert(s <= GenSnap.CapBytes,
        s"round $round: leaf stats $s exceed the cap ${GenSnap.CapBytes}")
      // once the cap engages it must stay EXACTLY pinned — constant per
      // generation is what makes planning O(1) across rounds
      if (prev == GenSnap.CapBytes)
        assert(s == GenSnap.CapBytes, s"round $round: cap came unpinned ($s)")
      prev = s
    }
    assert(prev == GenSnap.CapBytes,
      "ten squaring generations should have driven the estimate into the cap")
    assert(gen.count() == 1000)
  }

  test("the capped re-wrap reuses the checkpointed RDD (no row round-trip)") {
    val base = spark.range(1000)
      .select(col("id"), col("id").as("k"))
      .repartition(col("k"))
    // drive the estimate over the cap so the re-wrap path (not the
    // identity path) is the one under test
    var gen = GenSnap.snap(base.toDF())
    for (_ <- 1 to 4) gen = squaringStep(gen)
    assert(leafStats(gen) == GenSnap.CapBytes, "cap should be engaged")
    // the re-wrapped leaf must hold the checkpoint's OWN InternalRow rdd
    // — the r12 createDataFrame fix paid a Row round-trip, whose
    // converted rdd carries NO checkpoint storage mark (the mark stays
    // on the discarded Row rdd); a regression back to it would silently
    // double-materialize every generation
    val lrSnap = gen.queryExecution.logical
      .collectFirst { case lr: org.apache.spark.sql.execution.LogicalRDD => lr }.get
    assert(lrSnap.rdd.getStorageLevel.useMemory || lrSnap.rdd.getStorageLevel.useDisk,
      "snap must re-wrap the checkpoint-marked InternalRow RDD, not convert rows")
  }

  test("below the cap the frame and its honest estimate are untouched") {
    val small = spark.range(10).toDF()
    val snapped = GenSnap.snap(small)
    val s = leafStats(snapped)
    assert(s > 0 && s < GenSnap.CapBytes, s"expected an honest small estimate, got $s")
    assert(snapped.count() == 10)
  }

  test("capped generations can never be broadcast") {
    // the cap (64 GiB) sits far above the autoBroadcastJoinThreshold, so
    // a capped generation joined against a big side must not plan as the
    // build side of a BroadcastHashJoin — asserted on an EXECUTED plan,
    // not just the constant inequality (ADVICE r13: a future planner
    // visitor reading rowCount instead of sizeInBytes would slip past a
    // constant-only check)
    assert(GenSnap.CapBytes > BigInt(10L << 20))
    val base = spark.range(1000)
      .select(col("id"), col("id").as("k"))
      .repartition(col("k"))
    var gen = GenSnap.snap(base.toDF())
    for (_ <- 1 to 4) gen = squaringStep(gen)
    assert(leafStats(gen) == GenSnap.CapBytes, "cap should be engaged")
    // big enough that the PROBE side is over the 10 MB broadcast
    // threshold too — otherwise Spark broadcasts the probe side and the
    // test can't distinguish that legitimate plan from the violation
    val big = spark.range(3000000).select(col("id").as("k"), col("id").as("v"))
    val joined = big.join(gen, "k")
    joined.count() // executed, so AQE's final plan is the one inspected
    val executed = joined.queryExecution.executedPlan.toString
    assert(!executed.contains("BroadcastHashJoin"),
      s"a capped generation must not be broadcast:\n$executed")
    assert(executed.contains("SortMergeJoin") || executed.contains("ShuffledHashJoin"),
      s"expected a shuffle join over the capped side:\n$executed")
  }

  test("the capped re-wrap forwards the producer plan's constraints") {
    // the plain localCheckpoint leaf carries the producer's constraints
    // (e.g. non-null inference from an inner equi-join); the capped
    // re-wrap must not drop them, or downstream plans re-add redundant
    // IsNotNull filters (ADVICE r13)
    val base = spark.range(1000)
      .select(col("id"), col("id").as("k"))
      .repartition(col("k"))
    var gen = GenSnap.snap(base.toDF())
    for (_ <- 1 to 4) gen = squaringStep(gen)
    val lrSnap = gen.queryExecution.logical
      .collectFirst { case lr: org.apache.spark.sql.execution.LogicalRDD => lr }.get
    assert(leafStats(gen) == GenSnap.CapBytes, "cap should be engaged")
    // the squaring step's inner equi-join proves k (and id) non-null;
    // the plain (sub-cap) checkpoint of the same plan carries that —
    // the capped leaf must match it
    val plain = gen // already capped
    val uncappedTwin = squaringStep(GenSnap.snap(base.toDF()))
    val plainLr = uncappedTwin.queryExecution.logical
      .collectFirst { case lr: org.apache.spark.sql.execution.LogicalRDD => lr }.get
    assert(plainLr.constraints.nonEmpty,
      "fixture assumption: the checkpoint leaf carries producer constraints")
    assert(lrSnap.constraints.nonEmpty,
      "capped re-wrap dropped the producer plan's constraints")
    assert(plain.count() == 1000)
  }
}
