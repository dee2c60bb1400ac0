package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc schema/plan probe main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.printSchema()
    e.orderBy("event_id").select("event_id", "ts").show(3, truncate = false)
    spark.stop()
  }
}
