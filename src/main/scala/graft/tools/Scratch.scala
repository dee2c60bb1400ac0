package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway persist-level scan-cost experiment — NOT part of the contract.
  * arg0 = "java" | "kryo" (session serializer). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("java")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val b2 = if (mode == "kryo") b
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.registrationRequired", "false")
      .config("spark.kryo.referenceTracking", "false")
      .config("spark.kryo.classesToRegister",
        "org.apache.spark.sql.catalyst.expressions.UnsafeRow")
    else b
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new org.apache.spark.scheduler.SparkListener {
      val cpu = new java.util.concurrent.atomic.AtomicLong
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        cpu.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime / 1000000L)
    }
    spark.sparkContext.addSparkListener(acc)
    // synthetic 1.3M x 5-int frame, like the master edge leaf
    val base = spark.range(1300000).select(
      (col("id") % 21000).cast("int").as("src"),
      (col("id") % 190000).cast("int").as("dst"),
      (col("id") % 50).cast("int").as("w"),
      (col("id") % 2500).cast("int").as("t"),
      (col("id") % 400).cast("int").as("deg"))
      .repartition(32)
    def trial(name: String, lvl: StorageLevel): Unit = {
      val ck = base.localCheckpoint(eager = false, lvl)
      ck.count()
      for (p <- 1 to 3) {
        acc.cpu.set(0)
        val t0 = System.nanoTime()
        ck.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"SCRATCH $mode/$name scan p$p sec=$sec%.3f cpu=${acc.cpu.get / 1000.0}%.2fs")
      }
      val st = spark.sparkContext.getRDDStorageInfo
      println(f"SCRATCH $mode/$name memMB=${st.map(_.memSize).sum / 1048576}")
      ck.unpersist(true)
    }
    if (mode == "java") trial("deser", StorageLevel.MEMORY_AND_DISK)
    trial("ser", StorageLevel.MEMORY_AND_DISK_SER)
    spark.stop()
  }
}
