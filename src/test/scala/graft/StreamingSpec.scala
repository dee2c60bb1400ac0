package graft

import graft.streaming.Streams
import graft.streaming.Streams.Evt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("kafka wiring reaches the classpath boundary (connector absent by scope cut)") {
    // The spark-sql-kafka connector jar is not shipped in this container
    // (no egress), so the source can't execute — but the wiring must be
    // real: resolution has to fail looking up the 'kafka' DataSource,
    // NOT with a wiring error (bad option, bad schema, NPE). See
    // SURVEY.md §2.5a "Kafka source" for the scope-cut record.
    val e = intercept[Exception] {
      Streams.kafkaEvents(spark, "localhost:9092", "events").isStreaming
    }
    val msg = Option(e.getMessage).getOrElse("") + e.getClass.getName
    assert(msg.toLowerCase.contains("kafka"),
      s"expected the connector-missing failure naming 'kafka', got: $e")
  }

  test("watermarked tumbling window counts match the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val events = Seq(
      Evt(1, ts(5), 1, "click", 1.0),
      Evt(2, ts(20), 1, "click", 1.0),
      Evt(3, ts(65), 2, "view", 1.0),
      Evt(4, ts(70), 2, "click", 1.0)
    )
    val q = Streams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // append mode emits only closed windows; push the watermark forward
      input.addData(Evt(99, ts(600), 9, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .select("window_start", "event_type", "cnt")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = Streams.tumblingCounts(events.toDF())
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(batch.subsetOf(got))
    } finally q.stop()
  }

  test("file-source streaming over real event parquet matches the batch result") {
    // the harness events table, µs-converted, written as a streaming
    // source dir — the swap-in path for a production file/Kafka feed
    val dir = tempDir("graft_stream_src")
    val batchDf = graft.ops.Events.eventsUs(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batchDf.write.mode("overwrite").parquet(dir)
    val streamDf = spark.readStream
      .schema(batchDf.schema)
      .parquet(dir)
    val q = Streams.tumblingCounts(streamDf)
      .writeStream.format("memory").queryName("file_tumbling")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val got = spark.table("file_tumbling")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      val expect = Streams.tumblingCounts(batchDf)
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(got === expect)
    } finally q.stop()
  }

  test("streaming windowed sums + batch rank reproduce evt_window_topk exactly") {
    // the production split for streaming top-k: the stream owns the
    // (window, type) aggregation; ranking happens over the sink. The
    // composed result must equal the oracle-checked batch query.
    val dir = tempDir("graft_stream_topk")
    val batchDf = graft.ops.Events.eventsUs(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batchDf.write.mode("overwrite").parquet(dir)
    val streamDf = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = Streams.windowedValueSums(streamDf)
      .writeStream.format("memory").queryName("stream_wsums")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy("window_start")
        .orderBy(col("sum_u").desc, col("event_type").asc)
      val got = spark.table("stream_wsums")
        .withColumn("rk", row_number().over(rw))
        .filter(col("rk") <= 3)
        .select(col("window_start"), col("rk"), col("event_type"), col("cnt"),
          (col("sum_u") / 1e6).as("sum_value"))
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getString(2),
          r.getLong(3), r.getDouble(4))).toSet
      val expect = SparkEntry.queries("evt_window_topk")(spark, sf)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getString(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got === expect)
    } finally q.stop()
  }

  test("streaming OHLC bars equal the batch resample on real event parquet") {
    val dir = tempDir("graft_ohlc_src")
    val batchDf = graft.ops.Events.eventsUs(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batchDf.write.mode("overwrite").parquet(dir)
    val streamDf = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = Streams.ohlcBars(streamDf)
      .writeStream.format("memory").queryName("ohlc_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).toString, r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5))
      val got = spark.table("ohlc_stream").collect().map(key).toSet
      val expect = Streams.ohlcBars(batchDf).collect().map(key).toSet
      assert(got === expect)
      assert(expect.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch attribution join") {
    // both sides streaming, watermarked, event-time-bounded — inner
    // joins emit eagerly, so the finite AvailableNow run must produce
    // exactly the batch pair set from the same function
    val dir = tempDir("graft_ss_join")
    val batchDf = graft.ops.Events.eventsUs(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batchDf.write.mode("overwrite").parquet(dir)
    def side(df: org.apache.spark.sql.DataFrame, t: String) =
      df.filter(col("event_type") === t)
    val stream = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = Streams.attributionJoin(side(stream, "view"), side(stream, "purchase"))
      .writeStream.format("memory").queryName("ss_attr")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))
      val got = spark.table("ss_attr").collect().map(key).toSet
      val expect = Streams.attributionJoin(
          side(batchDf, "view"), side(batchDf, "purchase"))
        .collect().map(key).toSet
      assert(got === expect)
      assert(expect.nonEmpty)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched views only after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val q = Streams.attributionJoin(views.toDF(), purchases.toDF(), "left_outer")
      .writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").start()
    try {
      // a view with no matching purchase (different user)
      views.addData(Evt(1, ts(10), 7, "view", 0.0))
      purchases.addData(Evt(100, ts(30), 8, "purchase", 5.0))
      q.processAllAvailable()
      // not emitted yet: a future purchase could still match it
      assert(spark.table("ss_outer").filter(col("view_id") === 1).count() === 0L,
        "unmatched view emitted before the watermark closed its window")
      // push event time on BOTH sides far past watermark + join bound,
      // then run extra batches so the advanced watermark evicts state
      views.addData(Evt(2, ts(2000), 9, "view", 0.0))
      purchases.addData(Evt(101, ts(2000), 9, "purchase", 1.0))
      q.processAllAvailable()
      views.addData(Evt(3, ts(2010), 9, "view", 0.0))
      purchases.addData(Evt(102, ts(2010), 9, "purchase", 1.0))
      q.processAllAvailable()
      val evicted = spark.table("ss_outer").filter(col("view_id") === 1).collect()
      assert(evicted.length === 1, s"expected exactly one outer row, got ${evicted.length}")
      assert(evicted.head.isNullAt(2), "outer row must carry NULL purchase_id")
    } finally q.stop()
  }

  test("watermark drops events that arrive later than the allowed lateness") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val q = Streams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late_data")
      .outputMode("append").start()
    try {
      input.addData(Evt(1, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time far past the 2h watermark...
      input.addData(Evt(2, ts(600), 1, "click", 1.0))
      q.processAllAvailable()
      // ...then send an event for the long-closed first window
      input.addData(Evt(3, ts(12), 1, "click", 1.0))
      q.processAllAvailable()
      // close everything out
      input.addData(Evt(4, ts(2000), 1, "click", 1.0))
      q.processAllAvailable()
      val firstWindow = spark.table("late_data")
        .filter(col("window_start") === java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
        .select("cnt").collect().map(_.getLong(0))
      // the late event (id 3) must NOT be counted into the first window
      assert(firstWindow.toList === List(1L),
        s"late event leaked into closed window: ${firstWindow.toList}")
    } finally q.stop()
  }

  test("stream-stream join matches purchases to signups within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val su = signups.toDF().select(col("user_id").as("s_user"),
      col("ts").as("s_ts")).withWatermark("s_ts", "1 hour")
    val pu = purchases.toDF().select(col("event_id").as("p_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts")).withWatermark("p_ts", "1 hour")
    val joined = pu.join(su,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 2 HOURS"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      signups.addData(Evt(1, ts(0), 1, "signup", 0), Evt(2, ts(0), 2, "signup", 0))
      purchases.addData(
        Evt(10, ts(30), 1, "purchase", 5.0),   // within 2h of user 1 signup
        Evt(11, ts(200), 2, "purchase", 5.0),  // beyond 2h of user 2 signup
        Evt(12, ts(40), 3, "purchase", 5.0))   // no signup at all
      q.processAllAvailable()
      val matched = spark.table("ss_join").select("p_id")
        .collect().map(_.getLong(0)).toSet
      assert(matched === Set(10L), s"unexpected join matches: $matched")
    } finally q.stop()
  }

  test("streaming dedup keeps one row per event_id with watermark-bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val q = Streams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        Evt(1, ts(5), 1, "click", 1.0),
        Evt(1, ts(5), 1, "click", 1.0),  // same-batch duplicate
        Evt(2, ts(10), 2, "view", 1.0))
      q.processAllAvailable()
      input.addData(Evt(1, ts(30), 1, "click", 9.9)) // cross-batch duplicate id
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList.sorted
      // exactly one row per id, and for id 1 it is the FIRST arrival
      assert(ids === List((1L, 1.0), (2L, 1.0)), s"dedup emitted: $ids")
    } finally q.stop()
  }

  test("streaming near-dups equal the batch pairs, exactly once, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val isNew = col("doc_id") % 10 === 7
    val corpus = graft.ops.Text.docSketch(spark, sf).filter(!isNew)
      .localCheckpoint(false)
    val newDocs = Tables.documents(spark, sf).filter(isNew)
      .select("doc_id", "text")
    // the SAME operator in batch mode is the expectation — plus a
    // grounding check against dedup_incremental's best-match output
    val expect = Streams.streamingNearDups(newDocs, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expect.nonEmpty, "fixture must contain at least one near-dup pair")
    val bestFromPairs = expect.groupBy(_._1).map { case (n, ps) =>
      val best = ps.map { case (_, o, j) => (j, -o) }.max
      (n, -best._2, best._1)
    }.toSet
    val incr = SparkEntry.queries("dedup_incremental")(spark, sf).collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bestFromPairs === incr,
      "best pair per doc must match the oracle-checked incremental query")

    val input = MemoryStream[(Long, String)]
    val q = Streams.streamingNearDups(input.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("near_dups")
      .outputMode("append").start()
    try {
      val rows = newDocs.collect().map(r => (r.getLong(0), r.getString(1)))
      input.addData(rows.take(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      val emitted = spark.table("near_dups").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(emitted.toSet === expect,
        s"stream emitted ${emitted.toSet.size} distinct pairs, expected ${expect.size}")
      assert(emitted.length === expect.size,
        "each pair must emit exactly once (band-0-collision filter)")
    } finally q.stop()
  }

  test("file sink + checkpoint restarts without loss or duplication") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("graft-ckpt")
    val input = MemoryStream[Evt]
    def start() = input.toDF().writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    // batch 1 → stop → restart from the checkpoint → batch 2: the file
    // sink's transaction log must show exactly one row per event.
    var q = start()
    try {
      input.addData(Evt(1, ts(1), 1, "click", 1.0), Evt(2, ts(2), 1, "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    q = start()
    try {
      input.addData(Evt(3, ts(3), 2, "purchase", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toList === List(1L, 2L, 3L), s"sink rows: ${got.toList}")
  }

  test("stateful sessionization groups events by 30-minute gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val q = Streams.sessionize(spark, input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then 2h later two
      // more (second session); a late high-ts event advances the watermark
      input.addData(
        Evt(1, ts(0), 1, "click", 1.0),
        Evt(2, ts(10), 1, "click", 1.0),
        Evt(3, ts(130), 1, "view", 1.0),
        Evt(4, ts(135), 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(Evt(9, ts(1000), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Evt(10, ts(2000), 3, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter(col("user_id") === 1L)
        .collect().map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("n_events")))
      assert(sessions.length === 2, s"expected 2 sessions, got ${sessions.toList}")
      assert(sessions.map(_._2).sorted.toList === List(2L, 2L))
    } finally q.stop()
  }

  test("streaming CDC apply reconstructs the batch latest-wins state across out-of-order triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.CdcRec
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the full change log, rel_cdc_apply's shape: inserts, an update on
    // key 1, a delete on key 2, and a STALE late update on key 2 that
    // arrives after its delete (seq 2 < 3) and must not resurrect it
    val log = Seq(
      CdcRec(1L, 1L, "I", Some(10.0)),
      CdcRec(2L, 1L, "I", Some(20.0)),
      CdcRec(3L, 1L, "I", Some(30.0)),
      CdcRec(1L, 2L, "U", Some(11.0)),
      CdcRec(2L, 3L, "D", None),
      CdcRec(2L, 2L, "U", Some(21.0)))
    val input = MemoryStream[CdcRec]
    val q = Streams.cdcApply(spark, input.toDS())
      .writeStream.format("memory").queryName("cdc")
      .outputMode("update").start()
    try {
      // trigger 1: inserts + the key-1 update; trigger 2: the delete;
      // trigger 3: the late stale update arriving AFTER the delete
      input.addData(log(0), log(1), log(2), log(3)); q.processAllAvailable()
      input.addData(log(4)); q.processAllAvailable()
      input.addData(log(5)); q.processAllAvailable()
      // materialize: last emitted row per key, drop tombstones
      val rows = spark.table("cdc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      val streamState = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1 }
        .filter(_._2._3 != "D")
        .map { case (k, (_, _, op, v)) => (k, op, v) }.toSet
      // ground truth: the BATCH latest-wins dataflow (the same window
      // shape the driver gate hash-proves as rel_cdc_apply) on the log
      val batch = log.toDF("k", "seq", "op", "v")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy(col("seq").desc)))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .collect()
        .map(r => (r.getLong(0), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      assert(streamState === batch,
        s"stream-reconstructed state $streamState != batch $batch")
      // the tombstone must have HELD against the stale update
      assert(!streamState.exists(_._1 == 2L), "deleted key 2 resurrected")
      assert(streamState === Set((1L, "U", Some(11.0)), (3L, "I", Some(30.0))))
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState running totals accumulate across triggers on RocksDB state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Evt]
    val q = Streams.runningTotals(spark, input.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      input.addData(
        Evt(1, ts(0), 1, "p", 2.0),
        Evt(2, ts(5), 1, "p", 3.0),
        Evt(3, ts(6), 2, "p", 10.0))
      q.processAllAvailable()
      // second trigger: the ValueState from batch 1 must still be there
      input.addData(Evt(4, ts(10), 1, "p", 5.0))
      q.processAllAvailable()
      val rows = spark.table("running")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // update mode emits per-trigger snapshots; the LAST row per user
      // is the accumulated state
      val last = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
      assert(last(1L) === ((1L, 3L, 10.0)),
        s"user 1 must have n=3 total=10 after two triggers, got ${last(1L)}")
      assert(last(2L) === ((2L, 1L, 10.0)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming CUSUM equals the oracle-checked batch query across out-of-order triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.DayAgg
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // grounding, not a fixture: the REAL sf0.001 daily purchase series
    // (the same rollup the batch query runs), shipped as three triggers
    // with each trigger's days SHUFFLED (the processor's in-batch day
    // sort must restore order) and trigger 3 REPLAYING two already-
    // folded days (the idempotency guard must drop them, CDC-style)
    val daily = ops.Events.eventsUs(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("xu"))
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).as("epd"),
        col("xu"))
      .orderBy("epd")
      .collect().map(r => DayAgg(0L, r.getInt(0), r.getLong(1)))
    assert(daily.length >= 6, "need a real multi-day series")
    val (c1, rest) = daily.splitAt(daily.length / 3)
    val (c2, c3) = rest.splitAt(rest.length / 2)
    val rnd = new scala.util.Random(42)
    val input = MemoryStream[DayAgg]
    val q = Streams.cusumStream(spark, input.toDS())
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("update").start()
    try {
      input.addData(rnd.shuffle(c1.toSeq): _*); q.processAllAvailable()
      input.addData(rnd.shuffle(c2.toSeq): _*); q.processAllAvailable()
      // trigger 3: remaining days + a replay of the first two days
      input.addData(rnd.shuffle((c3 ++ daily.take(2)).toSeq): _*)
      q.processAllAvailable()
      val got = spark.table("cusum_stream").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .sortBy(_._1)
      // each day must be emitted EXACTLY once (replays dropped)
      assert(got.map(_._1).toSeq === daily.map(_.epd).toSeq)
      // ground truth: the driver-gate batch query, converted back to µunits
      val batch = SparkEntry.queries("evt_cusum")(spark, sf).collect()
        .map(r => (r.getDate(0).toLocalDate.toEpochDay.toInt,
          math.round(r.getDouble(1) * 1e6), math.round(r.getDouble(2) * 1e6),
          r.getBoolean(3)))
        .sortBy(_._1)
      assert(got.toSeq === batch.toSeq,
        "streaming CUSUM diverged from the batch prefix identity")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming SPRT equals the oracle-checked batch prefix bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.SprtDay
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // grounding: the REAL enrollment-day rollup the batch query runs
    // (treatment arm, first-event day, ab_test conversion flag), shipped
    // shuffled across triggers with trigger 2 replaying folded days
    val fd = ops.Events.eventsUs(spark, sf)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      .filter(col("user_id") % 2 === 1)
      .select(col("user_id"), to_date(col("t0")).as("day"))
    val cv = ops.Events.eventsUs(spark, sf)
      .filter(col("event_type") === "purchase" && col("value") > 200.0)
      .select(col("user_id")).distinct().withColumn("cflag", lit(1L))
    val daily = fd.join(cv, Seq("user_id"), "left")
      .groupBy("day")
      .agg(count(lit(1)).as("enrolls"),
        sum(coalesce(col("cflag"), lit(0L))).as("convs"))
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).as("epd"),
        col("enrolls"), col("convs"))
      .orderBy("epd")
      .collect().map(r => SprtDay(0L, r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(daily.nonEmpty, "need a real enrollment series")
    val rnd = new scala.util.Random(7)
    val input = MemoryStream[SprtDay]
    val q = Streams.sprtStream(spark, input.toDS())
      .writeStream.format("memory").queryName("sprt_stream")
      .outputMode("update").start()
    try {
      val (t1, t2) = daily.splitAt(math.max(1, daily.length / 2))
      input.addData(rnd.shuffle(t1.toSeq): _*); q.processAllAvailable()
      input.addData(rnd.shuffle((t2 ++ daily.take(1)).toSeq): _*)
      q.processAllAvailable()
      val got = spark.table("sprt_stream").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
        .sortBy(_._1)
      assert(got.map(_._1).toSeq === daily.map(_.epd).toSeq, "replays must fold once")
      val batch = SparkEntry.queries("evt_sprt")(spark, sf).collect()
        .map(r => (r.getDate(0).toLocalDate.toEpochDay.toInt,
          r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .sortBy(_._1)
      assert(got.toSeq === batch.toSeq,
        "streaming SPRT diverged from the batch LLR prefix")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming Holt-Winters equals the oracle-checked batch fold bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.DayAgg
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val daily = ops.Events.eventsUs(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("xu"))
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).as("epd"),
        col("xu"))
      .orderBy("epd")
      .collect().map(r => DayAgg(0L, r.getInt(0), r.getLong(1)))
    val (c1, c2) = daily.splitAt(daily.length / 2)
    val rnd = new scala.util.Random(7)
    val input = MemoryStream[DayAgg]
    val q = Streams.holtWintersStream(spark, input.toDS())
      .writeStream.format("memory").queryName("hw_stream")
      .outputMode("update").start()
    try {
      // chunks arrive in order; WITHIN a chunk days are shuffled (the
      // in-batch sort restores order) and chunk 2 replays chunk 1's
      // last day (the guard must drop it — re-entering the recurrence
      // would corrupt the level)
      input.addData(rnd.shuffle(c1.toSeq): _*); q.processAllAvailable()
      input.addData(rnd.shuffle((c2 :+ c1.last).toSeq): _*); q.processAllAvailable()
      val got = spark.table("hw_stream").collect()
        .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))
        .sortBy(_._1)
      assert(got.map(_._1).toSeq === daily.map(_.epd).toSeq, "one row per day")
      val batch = SparkEntry.queries("evt_holt_winters")(spark, sf).collect()
        .map(r => (r.getDate(0).toLocalDate.toEpochDay.toInt, r.getDouble(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .sortBy(_._1)
      // BIT-equality: same doubles, not approximately
      assert(got.toSeq === batch.toSeq,
        "streaming Holt-Winters diverged from the batch fold")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming sessionize reconstructs the oracle-checked batch session table") {
    // Grounding, not a fixture: the WHOLE sf0.001 events table (1000
    // rows, 15 users) flows through flatMapGroupsWithState across two
    // triggers with a mid-session split, a sentinel far-future event
    // advances the watermark so every session times out, and the result
    // must equal evt_session_window_native — whose own correctness the
    // DuckDB oracle gate proves. Batch session_window ends at
    // last + gap; the stream emits last-event time, so end_us differs
    // by exactly the 30-minute gap.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evts = ops.Events.eventsUs(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Evt].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Evt]
    val q = Streams.sessionize(spark, input.toDS())
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      val (a, b) = evts.splitAt(evts.length / 2)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val flushTs = new Timestamp(evts.map(_.ts.getTime).max + 24L * 3600 * 1000)
      input.addData(Evt(999999L, flushTs, 999999L, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_parity")
        .filter(col("user_id") =!= 999999L)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSet
      val want = SparkEntry.queries("evt_session_window_native")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2) - 1800000000L, r.getLong(3))).toSet
      assert(want.nonEmpty && got === want,
        s"stream sessions must equal the batch table: got ${got.size}, want ${want.size}")
    } finally q.stop()
  }

  test("streaming LTTB discards a replayed day whose bucket is still inside the open horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.DayAgg
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // W=7 buckets: b0={0,3} b1={7,9} b2={14,16,18}. The frozenThrough
    // guard only rejects buckets ≤ finalizedThrough+1, so after trigger 1
    // (finalizedThrough=0, frozen=1) a REPLAY of day 16 (bucket 2) is
    // accepted into `open` — values are chosen so that, were the replay
    // double-counted in bucket 2's centroid sums (c=4, sx=64, sy=540
    // instead of c=3, sx=48, sy=290), bucket 1's |2·area·c| argmax flips
    // from day 7 to day 9. The dedupe-by-epd guard must keep day 7.
    val pts = Seq(
      DayAgg(0L, 0, 0L), DayAgg(0L, 3, 5L),            // b0 (anchor keeps day 0)
      DayAgg(0L, 7, 99L), DayAgg(0L, 9, 1L),           // b1 candidates
      DayAgg(0L, 14, 20L), DayAgg(0L, 16, 250L), DayAgg(0L, 18, 20L)) // b2 centroid
    val input = MemoryStream[DayAgg]
    val q = Streams.lttbStream(spark, input.toDS())
      .writeStream.format("memory").queryName("lttb_replay_open")
      .outputMode("update").start()
    try {
      input.addData(pts.take(5): _*); q.processAllAvailable()   // … day 14 arrives
      input.addData(pts.drop(5): _*); q.processAllAvailable()   // 16, 18
      input.addData(DayAgg(0L, 16, 250L)); q.processAllAvailable() // REPLAY of open day 16
      input.addData(DayAgg(0L, 35, 0L)); q.processAllAvailable()   // flush: finalize b1, b2
      val got = spark.table("lttb_replay_open").collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).sortBy(_._1).toSeq
      assert(got === Seq((0, 0, 0L), (1, 7, 99L), (2, 14, 20L)),
        s"open-horizon replay must be idempotent: got $got")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming LTTB equals the sequential fixed-bucket fold over shuffled triggers with replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.{DayAgg, LttbPt}
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val W = Streams.LttbBucketDays
    // the REAL sf0.001 daily purchase series, one point per day
    val daily = ops.Events.eventsUs(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("xu"))
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).as("epd"),
        col("xu"))
      .orderBy("epd")
      .collect().map(r => DayAgg(0L, r.getInt(0), r.getLong(1)))
    assert(daily.length >= 4 * W, "need several buckets of real days")
    // reference: the same freeze/finalize rules folded sequentially in
    // day order — bucket b finalizes when a point lands in b+2+, anchor
    // keeps the first point, |2·area·c| exact-BIGINT argmax, ties to
    // the earliest day, empty next bucket degrades area to 0
    def bucketOf(epd: Int) = Math.floorDiv(epd, W)
    val expected = {
      var open = Vector.empty[LttbPt]
      var haveLast = false
      var lastX = 0L; var lastY = 0L
      val out = Seq.newBuilder[(Int, Int, Long)]
      daily.foreach { p =>
        open = (open :+ LttbPt(p.epd, p.xu)).sortBy(_.epd)
        var advanced = true
        while (advanced) {
          advanced = false
          val bs = open.map(q => bucketOf(q.epd))
          if (bs.nonEmpty && bs.max >= bs.min + 2) {
            val bMin = bs.min
            val (cand, rest) = open.partition(q => bucketOf(q.epd) == bMin)
            val keep =
              if (!haveLast) cand.head
              else {
                val nxt = rest.filter(q => bucketOf(q.epd) == bMin + 1)
                val c = nxt.size.toLong
                val sx = nxt.map(_.epd.toLong).sum
                val sy = nxt.map(_.yu).sum
                cand.maxBy { q =>
                  val a = (BigInt(lastX) * c - sx) * (q.yu - lastY) -
                    BigInt(lastX - q.epd) * (sy - BigInt(lastY) * c)
                  (a.abs, -q.epd)
                }
              }
            out += ((bMin, keep.epd, keep.yu))
            haveLast = true; lastX = keep.epd.toLong; lastY = keep.yu
            open = rest
            advanced = true
          }
        }
      }
      out.result()
    }
    assert(expected.size >= 2, "fixture must finalize at least two buckets")
    // stream: three triggers, days shuffled WITHIN each trigger (the
    // in-batch sort restores order; the 2-bucket horizon is respected
    // because trigger boundaries are cuts of the ordered series), the
    // last trigger replaying the first two days (guard must drop them)
    val (c1, rest) = daily.splitAt(daily.length / 3)
    val (c2, c3) = rest.splitAt(rest.length / 2)
    val rnd = new scala.util.Random(7)
    val input = MemoryStream[DayAgg]
    val q = Streams.lttbStream(spark, input.toDS())
      .writeStream.format("memory").queryName("lttb_stream")
      .outputMode("update").start()
    try {
      input.addData(rnd.shuffle(c1.toSeq): _*); q.processAllAvailable()
      input.addData(rnd.shuffle(c2.toSeq): _*); q.processAllAvailable()
      input.addData(rnd.shuffle((c3 ++ daily.take(2)).toSeq): _*)
      q.processAllAvailable()
      val got = spark.table("lttb_stream").collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
        .sortBy(_._1)
      assert(got.toSeq === expected,
        s"streaming LTTB diverged: got ${got.toSeq}, want $expected")
      // downsampling sanity: one kept point per finalized bucket
      assert(got.map(_._1).distinct.length === got.length)
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
