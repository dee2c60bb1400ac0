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
    if (mode == "leaf") {
      // the REAL master-leaf view: is the columnar cache serving scans?
      val ue = graft.graph.PropertyGraph.undirectedEdges(spark, "/root/testdata/sf0.1")
      ue.explain("formatted")
      for (p <- 1 to 3) {
        acc.cpu.set(0)
        val t0 = System.nanoTime()
        ue.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"SCRATCH leaf scan p$p sec=$sec%.3f cpu=${acc.cpu.get / 1000.0}%.2fs")
      }
      val st = spark.sparkContext.getRDDStorageInfo
      st.sortBy(-_.memSize).take(5).foreach(i =>
        println(f"SCRATCH leaf resident mem=${i.memSize / 1048576.0}%.1f disk=${i.diskSize / 1048576.0}%.1f MB ${i.name}"))
      spark.stop(); return
    }
    if (mode == "java") trial("deser", StorageLevel.MEMORY_AND_DISK)
    trial("ser", StorageLevel.MEMORY_AND_DISK_SER)
    // columnar cache OVER a serialized checkpoint leaf: does the
    // InMemoryTableScan serve built columnar batches (small + fast), or
    // re-evaluate the child per scan (r17's cache() pathology)?
    if (mode == "java") {
      val ck = base.localCheckpoint(eager = false,
        StorageLevel.MEMORY_AND_DISK_SER)
      ck.count()
      val c2 = ck.cache()
      c2.count()
      for (p <- 1 to 3) {
        acc.cpu.set(0)
        val t0 = System.nanoTime()
        c2.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"SCRATCH cache-over-leaf scan p$p sec=$sec%.3f cpu=${acc.cpu.get / 1000.0}%.2fs")
      }
      val st = spark.sparkContext.getRDDStorageInfo
      st.sortBy(-_.memSize).take(3).foreach(i =>
        println(f"SCRATCH cache-over-leaf resident ${i.memSize / 1048576.0}%.1f MB ${i.name}"))
      c2.unpersist(true); ck.unpersist(true)
    }
    spark.stop()
  }
}
