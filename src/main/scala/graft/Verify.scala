package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * r18 hardening (VERDICT-r17 task 2 — CORRECTNESS_r{16,17}.json both
  * shipped EMPTY): the sequential dump measured ~6 s/query at sf0.01 ≈
  * 35 min for 330 queries, and oracle_sql.json was written LAST — a
  * driver that kills Verify on a time budget was left with parquet dirs
  * it could not compare against anything, i.e. n_queries: 0. Two fixes:
  *  - oracle_sql.json is written FIRST, so a partial dump is still a
  *    comparable (partial) correctness artifact;
  *  - the per-query dumps run from a small thread pool (guide §2.6 —
  *    independent actions back-fill each other's stragglers; the wall
  *    was per-query driver latency, not executor saturation). Safe
  *    because session memos build once behind computeIfAbsent, published
  *    index artifacts are content-keyed (fingerprint, not "latest"), and
  *    GenSnap.noAqe is depth-counted for concurrent fixpoint loops. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name-prefix filter for fast local
    // iteration on a single query (the driver always runs the full set)
    val keep: String => Boolean = args.lift(2) match {
      case Some(p) => n => p.split(",").exists(n.startsWith)
      case None    => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS) — see Events.eventsUs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Parallel dump: 8 in-flight queries hide each other's per-job driver
    // latency (the sequential wall). Memo builds serialize behind their
    // computeIfAbsent, so the first wave also warms the shared artifacts.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val t0 = System.nanoTime()
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val names = SparkEntry.queries.keys.filter(keep).toSeq
    names.foreach { name =>
      pool.execute { () =>
        try {
          spark.sparkContext.setJobDescription(s"verify: $name")
          SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
            .mode("overwrite").parquet(s"$outDir/$name")
          val n = done.incrementAndGet()
          if (n % 50 == 0) System.err.println(
            f"[verify] $n/${names.size} dumped (${(System.nanoTime() - t0) / 1e9}%.0f s)")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS)
    System.err.println(
      f"[verify] ${done.get}/${names.size} dumped in ${(System.nanoTime() - t0) / 1e9}%.0f s")
    spark.stop()
  }
}
