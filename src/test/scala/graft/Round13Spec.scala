package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: incremental NN-descent (batch nodes join the
  * existing graph without a rebuild) and the two-level-batched temporal
  * reachability fixpoint. */
class Round13Spec extends SparkSpec {

  test("incremental NN-descent: batch recall >= 0.9 vs the full rebuild") {
    val full = SparkEntry.queries("ann_nndescent_graph")(spark, sf)
      .select("vec_id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = SparkEntry.queries("ann_nndescent_incremental")(spark, sf)
      .select("vec_id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the claim under test is the INGESTION path: the new arrivals'
    // lists must land where a scratch rebuild would put them
    val batchFull = full.filter(_._1 % 10 == 7)
    val batchInc = inc.filter(_._1 % 10 == 7)
    assert(batchFull.nonEmpty && batchInc.nonEmpty)
    val recall = (batchInc intersect batchFull).size.toDouble / batchFull.size
    assert(recall >= 0.9, s"incremental batch recall $recall < 0.9")
    // and the untouched old nodes keep k-deep lists too (the merge did
    // not orphan anyone): every node has exactly k rows
    val perNode = SparkEntry.queries("ann_nndescent_incremental")(spark, sf)
      .groupBy("vec_id").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 8).count()
    assert(perNode == 0, s"$perNode nodes lack exactly 8 neighbors")
  }

  test("incremental NN-descent plans only hash equi-joins (no corpus product)") {
    val p = SparkEntry.queries("ann_nndescent_incremental")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"incremental descent must never plan a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"incremental descent must never plan a nested-loop product:\n$p")
  }

  test("incremental NN-descent candidate volume scales with the batch") {
    // quantitative bound, not just plan shape: the final merged graph
    // restricted to batch sources carries exactly |batch|·k rows, and
    // the batch descent state can never exceed |batch|·KB edges — if an
    // implementation regression ever introduced corpus-sized pivots the
    // per-source cap would still hold but OLD sources would appear with
    // fresh (non-gOld) neighbors en masse; pin that: old nodes' lists
    // may differ from the pure old-corpus build only by NEW members.
    val out = SparkEntry.queries("ann_nndescent_incremental")(spark, sf)
      .select("vec_id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nBatch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 7).count()
    assert(out.count(_._1 % 10 == 7) == nBatch * 8)
    // every OLD source's neighbor is either old (from its existing list)
    // or a genuinely new arrival (folded in by the reverse merge)
    val oldRows = out.filter(_._1 % 10 != 7)
    assert(oldRows.nonEmpty)
    val gainedNew = oldRows.count(_._2 % 10 == 7)
    assert(gainedNew > 0,
      "some old node should have gained a new arrival that beats its k-th")
  }

  test("doremi weights: normalized, and monotone in domain excess loss") {
    val rows = SparkEntry.queries("ml_doremi_weights")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(rows.length == 20, "one row per source domain")
    val wSum = rows.map(_._3).sum
    // truncating renormalization loses at most 1 unit per domain per round
    assert(wSum <= (1L << 24) && wSum >= (1L << 24) - rows.length,
      s"weights must stay ~2^24-normalized, got $wSum")
    // multiplicative weights with a static loss must ORDER weights by
    // excess loss: a domain with strictly higher excess never ends lighter
    rows.sortBy(_._2).sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._3 <= hi._3,
        s"${hi._1} (excess ${hi._2}) ended lighter than ${lo._1} (excess ${lo._2})")
    }
    // and the loop genuinely moved mass: max weight above uniform
    assert(rows.map(_._3).max > (1L << 24) / 20)
  }

  test("mixture sample meets every language budget without overshoot") {
    val rows = SparkEntry.queries("text_mixture_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val langs = Tables.documents(spark, sf).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(rows.map(_._1).toSet == langs, "every language must be sampled")
    rows.groupBy(_._1).foreach { case (lang, picks) =>
      val budget = if (lang == "en") 20000L else 5000L
      val sorted = picks.sortBy(_._2)
      // ranks are contiguous from 1 (a prefix of the hash order)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"$lang picks are not a rank prefix")
      val last = sorted.last
      // every pick except possibly the last starts inside the budget,
      // and the selection either crosses the budget or exhausted the lang
      assert(last._5 - last._4 < budget, s"$lang overshot: kept a doc starting past budget")
      val total = Tables.documents(spark, sf).filter(col("lang") === lang).count()
      assert(last._5 >= budget || sorted.length == total,
        s"$lang under-filled: ${last._5} chars of $budget with docs remaining")
    }
  }

  test("z-order layout prunes the cust probe strictly better than date-linear") {
    val rows = SparkEntry.queries("rel_zorder_layout")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(7)))
    val (z, lin) = rows.partition(_._1 == "zorder")
    assert(z.nonEmpty && lin.nonEmpty)
    // both layouts place every row
    assert(z.map(_._3).sum == lin.map(_._3).sum, "layouts must cover the same rows")
    val zHits = z.count(_._4)
    val linHits = lin.count(_._4)
    // the whole point of the interleave: a narrow custkey band touches
    // one grid COLUMN under z-order but every date-run file under linear
    assert(zHits < linHits,
      s"z-order must prune harder: z=$zHits/${z.length} vs linear=$linHits/${lin.length}")
    // both layout aggregations must read the staged z-annotated rows,
    // not re-scan orders: the snap hides the one real scan behind a
    // checkpoint leaf, so the final plan carries NO parquet scan and
    // no sort-merge join (the bounds side broadcasts)
    val plan = SparkEntry.queries("rel_zorder_layout")(spark, sf)
      .queryExecution.executedPlan
    val un = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val scans = un.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.isEmpty, s"layout report re-scans parquet ${scans.size}x")
    assert(!plan.toString.contains("SortMergeJoin"), "bounds must broadcast")
  }

  test("temporal reach multi-level batching matches the single-level fixpoint") {
    // replay the UNBATCHED relaxation here (test-only) and require the
    // batched kernel's fixpoint to be identical row-for-row
    val spark2 = spark
    import spark2.implicits._
    val PartIdOffset = 1000000L
    val e0 = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey").as("a"), (col("l_partkey") + PartIdOffset).as("b"))
      .agg(min(expr(
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)")).as("t"))
    val et = e0.select(col("a").as("src"), col("b").as("dst"), col("t"))
      .union(e0.select(col("b").as("src"), col("a").as("dst"), col("t")))
      .cache()
    var arr = Seq((1L, 0L)).toDF("id", "arr").localCheckpoint()
    var frontier = arr
    var live = true
    var guard = 0
    while (live) {
      guard += 1
      assert(guard <= 64, "unbatched replay did not converge")
      val imp = et
        .join(frontier.select(col("id").as("src"), col("arr").as("va")), "src")
        .filter(col("t") >= col("va"))
        .groupBy(col("dst").as("id")).agg(min("t").as("cand"))
        .join(arr.select(col("id").as("id2"), col("arr").as("old")),
          col("id") === col("id2"), "left")
        .filter(col("old").isNull || col("cand") < col("old"))
        .select(col("id"), col("cand").as("arr"))
        .localCheckpoint(false)
      if (imp.count() == 0L) live = false
      else {
        frontier = imp
        arr = imp.union(arr.join(imp.select(col("id")), Seq("id"), "left_anti"))
          .localCheckpoint(false)
      }
    }
    val expected = arr.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("graph_temporal_reach")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"batched fixpoint diverged: ${(got diff expected).take(5)} vs ${(expected diff got).take(5)}")
    et.unpersist()
  }
}
