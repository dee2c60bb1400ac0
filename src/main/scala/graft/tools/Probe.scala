package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc probe main (not part of the driver contract): times the named
  * SparkEntry queries (args = query names, optional leading sfDir). */
object Probe {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail)
      else ("/root/testdata/sf0.1", args)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; pass <- 1 to 2) {
      if (pass == 1 && sys.env.contains("PROBE_EXPLAIN"))
        graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(s"PROBE $n pass=$pass rows=$rows sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
