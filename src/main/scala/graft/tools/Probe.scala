package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc probe main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val r = graft.cluster.KMeans.run(spark, graft.Tables.embeddings(spark, d), k = 8)
      println(s"PROBE $d iterations=${r.iterations} sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
