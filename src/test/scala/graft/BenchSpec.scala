package graft

/** VERDICT-r13 task 1: the bench harness must never report a throwing
  * query as a plausible timing. r12's graph_temporal_reach crash shipped
  * as a "6.56 s" number for a full round because the timed pass swallowed
  * the exception. These tests drive Bench's real runPass/merge/renderJson
  * with a deliberately broken query and pin that the throw is visibly
  * recorded as an error — excluded from the timings map AND the total. */
class BenchSpec extends SparkSpec {
  import Bench.{QTime, Measurement0}
  import org.apache.spark.sql.DataFrame

  private val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] = Seq(
    "ok_query" -> ((s, dir) => s.read.parquet(s"$dir/region.parquet")),
    // throws PATH_NOT_FOUND during schema inference — a real failure mode
    // (count() would prune a deliberately-failing projected column away)
    "broken_query" -> ((s, dir) => s.read.parquet(s"$dir/__deliberately_missing__.parquet"))
  )

  test("runPass records a throwing query as err, not a silent timing") {
    val pass = Bench.runPass(spark, sf, qs)
    val byName = pass.map(q => q.name -> q).toMap
    assert(byName("ok_query").err.isEmpty)
    assert(byName("broken_query").err.isDefined,
      "a throwing query must carry an error in the pass result")
    assert(byName("broken_query").err.get.nonEmpty)
  }

  test("merge propagates an error from ANY pass (no hiding behind a lucky pass)") {
    val p1 = Seq(QTime("q", 1.0, None))
    val p2 = Seq(QTime("q", 0.5, Some("boom")))
    val p3 = Seq(QTime("q", 0.7, None))
    val merged = Bench.merge(Seq(p1, p2, p3))
    assert(merged.head.err.contains("boom"))
    assert(merged.head.sec == 0.5) // min still carried for diagnostics
  }

  test("renderJson surfaces errors loudly and excludes them from timings/total") {
    val m = Measurement0(
      results = Seq(QTime("good_q", 2.0, None), QTime("bad_q", 9.9, Some("SparkException: deliberate"))),
      wallTimed = 12.0, passTotals = Seq(4.0, 4.0, 4.0), skew = 1.0,
      otherCpuCores = 0.0, loadStart = 0.1, loadEnd = 0.2, tainted = false,
      storageMb = 0L, storageDiskMb = 0L)
    val json = Bench.renderJson(m, "/tmp/sf", attempts = 1)
    assert(json.contains(""""errors":1"""), json)
    assert(json.contains(""""bad_q":"SparkException: deliberate""""), json)
    // the broken query's time-to-failure must NOT appear as a timing
    assert(!json.contains(""""bad_q":9.9""") && !json.contains(""""bad_q":9.900"""), json)
    assert(json.contains(""""value":2.000"""), "total must cover only ok queries: " + json)
    assert(json.contains(""""timed":1"""), json)
    // errors fields appear BEFORE the queries map so stdout-tail
    // truncation loses timings, never the failure signal
    assert(json.indexOf(""""errors":""") < json.indexOf(""""queries":"""), json)
  }

  test("renderJson with zero errors keeps the legacy shape (errors:0, all queries timed)") {
    val m = Measurement0(
      results = Seq(QTime("a", 1.0, None), QTime("b", 3.0, None)),
      wallTimed = 12.0, passTotals = Seq(4.0, 4.0, 4.0), skew = 1.0,
      otherCpuCores = 0.0, loadStart = 0.1, loadEnd = 0.2, tainted = false,
      storageMb = 5L, storageDiskMb = 0L)
    val json = Bench.renderJson(m, "/tmp/sf", attempts = 1)
    assert(json.contains(""""errors":0"""))
    assert(json.contains(""""value":4.000"""))
    assert(json.contains(""""a":1.000""") && json.contains(""""b":3.000"""))
    assert(json.contains(""""tainted":false"""))
    assert(json.contains(""""storage_ok":true"""))
  }

  test("one elevated pass self-flags via dispersion even under the skew gate") {
    // VERDICT-r14 task 4: BENCH_r14 shipped pass totals [267.1, 368.3,
    // 296.5] — one pass +38% — with skew 1.255 < 1.5, so the old gate
    // passed a measurement that overstated the total ~12%. The synthetic
    // twin of that shape must now be tainted purely on dispersion.
    val elevated = Seq(267.1, 368.3, 296.5)
    assert(Bench.passDispersion(elevated) > Bench.DispersionThreshold)
    assert(Bench.isTainted(loadStart = 0.5, otherCpuCores = 0.1,
      skew = 1.255, passTotals = elevated),
      "the r14 one-bad-pass shape must self-flag")
    // and the judge's quiet-box shape (passes within 2.5%) stays clean
    val quiet = Seq(234.8, 233.1, 239.0)
    assert(Bench.passDispersion(quiet) <= Bench.DispersionThreshold)
    assert(!Bench.isTainted(loadStart = 0.5, otherCpuCores = 0.1,
      skew = 1.071, passTotals = quiet))
    // the other three triggers still fire independently
    assert(Bench.isTainted(3.0, 0.0, 1.0, quiet), "pre-existing load")
    assert(Bench.isTainted(0.0, 3.0, 1.0, quiet), "external CPU")
    assert(Bench.isTainted(0.0, 0.0, 1.6, quiet), "mean-vs-best skew")
  }

  test("renderJson carries pass_dispersion for the artifact reader") {
    val m = Measurement0(
      results = Seq(QTime("a", 1.0, None)),
      wallTimed = 3.0, passTotals = Seq(1.0, 1.3, 1.0), skew = 1.1,
      otherCpuCores = 0.0, loadStart = 0.1, loadEnd = 0.2, tainted = true,
      storageMb = 0L, storageDiskMb = 0L)
    val json = Bench.renderJson(m, "/tmp/sf", attempts = 2)
    assert(json.contains(""""pass_dispersion":1.300"""), json)
    assert(json.contains(""""tainted":true"""), json)
  }

  test("renderJson flags a storage-budget breach") {
    val m = Measurement0(
      results = Seq(QTime("a", 1.0, None)),
      wallTimed = 3.0, passTotals = Seq(1.0, 1.0, 1.0), skew = 1.0,
      otherCpuCores = 0.0, loadStart = 0.1, loadEnd = 0.2, tainted = false,
      storageMb = Bench.StorageBudgetMb + 1, storageDiskMb = 0L)
    assert(Bench.renderJson(m, "/tmp/sf", attempts = 1)
      .contains(""""storage_ok":false"""))
  }
}
