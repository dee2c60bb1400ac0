package graft

import graft.ops.{Vector => V}
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {

  import spark.implicits._

  test("cosine similarity: identical → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (1L, Array(1.0, 0.0), Array(1.0, 0.0)),
      (2L, Array(1.0, 0.0), Array(0.0, 1.0)),
      (3L, Array(1.0, 0.0), Array(-1.0, 0.0))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), V.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
  }

  test("brute-force top-k returns the true nearest neighbors") {
    // construct vectors where similarity to the query is by design
    val q = Array(1.0, 0.0, 0.0)
    val df = Seq(
      (1L, Array(0.9, 0.1, 0.0)),   // closest
      (2L, Array(0.5, 0.5, 0.0)),
      (3L, Array(0.0, 1.0, 0.0)),   // orthogonal
      (4L, Array(-1.0, 0.0, 0.0))   // opposite
    ).toDF("vec_id", "v")
    val ranked = df.select(col("vec_id"),
      V.cosine(col("v"), lit(q).cast("array<double>")).as("sim"))
      .orderBy(col("sim").desc).collect().map(_.getLong(0)).toList
    assert(ranked === List(1L, 2L, 3L, 4L))
  }

  test("vec_stats matches manual computation on a literal vector") {
    val xs = Array(4.0, 1.0, 3.0, 2.0)
    val df = Seq((1L, xs)).toDF("vec_id", "v")
    val v = col("v")
    val mean = V.seqSum(v) / size(v)
    val out = df.select(
      mean.as("mean"),
      sqrt(V.seqSum(transform(v, x => (x - mean) * (x - mean))) / size(v)).as("std"),
      array_min(v).as("mn"), array_max(v).as("mx")).head()
    assert(out.getDouble(0) === 2.5)
    assert(math.abs(out.getDouble(1) - math.sqrt(1.25)) < 1e-12)
    assert(out.getDouble(2) === 1.0)
    assert(out.getDouble(3) === 4.0)
  }

  test("IVF search recalls most of the brute-force top-10") {
    val ivf = SparkEntry.queries("ann_ivf_topk")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val bf = SparkEntry.queries("ann_bruteforce_topk")(spark, sf)
      .limit(10).collect().map(_.getLong(0)).toSet
    val recall = ivf.intersect(bf).size / 10.0
    // measured 1.0 on the harness data (cosine-near vectors share their
    // cosine-nearest cell); 0.5 guards against fixture drift
    assert(recall >= 0.5, s"IVF recall@10 = $recall")
  }

  test("LSH bucket assignment is deterministic across runs") {
    val q = SparkEntry.queries("ann_lsh_buckets")
    val a = q(spark, sf).collect().map(r => (r.getInt(0), r.getLong(1))).toList
    val b = q(spark, sf).collect().map(r => (r.getInt(0), r.getLong(1))).toList
    assert(a === b)
    assert(a.map(_._2).sum === Tables.embeddings(spark, sf).count())
  }

  test("LSH top-k ranks exactly within the candidate union and recalls brute-force hits") {
    val lsh = SparkEntry.queries("ann_lsh_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toList
    assert(lsh.nonEmpty)
    // the ranking must be EXACT within the multi-table candidate union:
    // recompute it via an independent formulation (per-row array of all
    // table buckets, OR-collision filter) and compare the top-k
    val withB = Tables.embeddings(spark, sf)
      .select(col("vec_id"), V.vec(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        array((0 until V.LshTables).map(t => V.lshTableBucket(col("v"), t)): _*).as("bs"))
    val q = withB.filter(col("vec_id") === 0L)
      .select(col("bs").as("qbs"), col("v").as("qv"))
    val expect = withB.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0L)
      .filter(exists(zip_with(col("bs"), col("qbs"), (a, b) => a === b), x => x))
      .select(col("vec_id"), V.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toList
    assert(lsh === expect)
    // approximate recall vs the exact brute-force top-10 (mirrors the
    // IVF recall test; sims here top out ~0.33 → per-plane p≈0.6, so
    // k=4/L=8 predicts recall ≈ 1−(1−p⁴)⁸ ≈ 0.67)
    val bf = SparkEntry.queries("ann_bruteforce_topk")(spark, sf)
      .limit(10).collect().map(_.getLong(0)).toSet
    val recall = lsh.map(_._1).toSet.intersect(bf).size / 10.0
    assert(recall >= 0.3, s"LSH recall@10 = $recall")
  }

  test("LSH cells stored bucketed by cell key: a probe scans L buckets, not the corpus") {
    // the 100 TB claim behind ann_lsh_topk: the (table, bucket) cells are
    // WRITTEN bucketed, so a probe's IN-filter on its L cells is pruned
    // to L storage buckets at plan time instead of scanning the corpus.
    // Spark prunes buckets only for single-column bucketing, so the cell
    // key is the combined integer tbl·256 + bucket.
    val tmp = tempDir("graft-lshcells")
    val nBuckets = 32
    // DisableUnnecessaryBucketedScan turns the bucketed read OFF when the
    // plan has no bucket-key join/agg — which also drops bucket PRUNING.
    // A production LSH probe sets this too: pruning IS the utilization.
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val autoWas = spark.conf.get(autoKey)
    spark.conf.set(autoKey, "false")
    try {
      val withCell = Tables.embeddings(spark, sf)
        .select(col("vec_id"), V.vec(col("embedding")).as("v"))
        .select(col("vec_id"), col("v"),
          explode(array((0 until V.LshTables).map(t =>
            lit(t * 256) + V.lshTableBucket(col("v"), t)): _*)).as("cell"))
      withCell.write.mode("overwrite").bucketBy(nBuckets, "cell")
        .option("path", s"$tmp/cells").saveAsTable("lsh_cells")
      val probe = withCell.filter(col("vec_id") === 0L)
        .select(col("cell"), col("v").as("qv")).collect()
      val cellIds = probe.map(_.getInt(0)).distinct.toSeq
      val qv = probe.head.getAs[scala.collection.Seq[Double]]("qv").toArray
      val scan = spark.table("lsh_cells").filter(col("cell").isin(cellIds: _*))
      // plan-time proof: the scan reads only the probe's buckets
      val plan = scan.queryExecution.executedPlan.toString()
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"scan must be bucket-pruned:\n$plan")
      assert(sel.get.group(1).toInt <= cellIds.size &&
        sel.get.group(2).toInt == nBuckets,
        s"expected ≤${cellIds.size} of $nBuckets buckets: ${sel.get.matched}")
      // result-equivalence proof: the bucket-pruned probe ranks the same
      // top-k as the full ann_lsh_topk pipeline
      val pruned = scan.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          V.cosine(col("v"), typedLit(qv)).as("sim"))
        .groupBy("vec_id").agg(max(col("sim")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toList
      val full = SparkEntry.queries("ann_lsh_topk")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toList
      assert(pruned === full)
    } finally {
      spark.conf.set(autoKey, autoWas)
      spark.sql("DROP TABLE IF EXISTS lsh_cells")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("PQ typed kernel is bit-identical to the HOF composition") {
    val kernel = V.pqTopk(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toList
    val hof = V.pqTopkHof(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toList
    // exact double equality on purpose: the kernel claims the same fold
    // order as the HOF form (which the DuckDB oracle replays)
    assert(kernel === hof)
  }

  test("RQ typed kernel is bit-identical to the HOF composition") {
    // same contract as the PQ pair: the while-loop kernel (benched path,
    // driver-side codebooks) must replay the declarative form's folds —
    // coarse argmin, residual subtraction, per-subspace argmin, adist
    // accumulation — bit-for-bit, since the DuckDB oracle mirrors the HOF
    val kernel = V.rqTopk(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toList
    val hof = V.rqTopkHof(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toList
    assert(kernel === hof)
  }

  test("PQ top-k returns genuinely close vectors under the true L2 metric") {
    val pq = SparkEntry.queries("ann_pq_topk")(spark, sf).collect()
    assert(pq.length === 10)
    val adists = pq.map(_.getDouble(1))
    assert(adists.forall(_ >= 0.0) && (adists, adists.sorted).zipped.forall(_ == _),
      "asymmetric distances must be non-negative and ascending")
    // usefulness, robust to codebook coarseness: the TRUE L2² of PQ's
    // picks must average well below the corpus mean L2² to the query
    // (a random pick would sit at the mean; exact recall is measured at
    // the calibrated 0.3 level at sf0.01 — see Vector.scala scaladoc)
    def l2sq(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      V.seqSum(zip_with(a, b, (x, y) => (x - y) * (x - y)))
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), V.vec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0L).select(col("v").as("qv"))
    val trueD = e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"), l2sq(col("v"), col("qv")).as("d2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val corpusMean = trueD.values.sum / trueD.size
    val pickMean = pq.map(r => trueD(r.getLong(0))).sum / pq.length
    assert(pickMean < 0.8 * corpusMean,
      s"PQ picks avg true L2²=$pickMean vs corpus mean $corpusMean — not discriminating")
  }

  test("JL random projection preserves norms in expectation (±20% over the corpus)") {
    // For ±1 rows r_j, E[(r_j·q)²] = ||q||², so Σ_j y_j² / 16 ≈ ||q||².
    // Per-vector concentration over 16 dims is loose; averaged over the
    // corpus the ratio must sit near 1 — the property that makes the
    // projection usable for distance-based pruning at all.
    val proj = SparkEntry.queries("vec_random_projection")(spark, sf)
      .groupBy("vec_id").agg(sum(col("y") * col("y")).as("pn2"))
    val orig = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        V.seqSum(transform(V.vec(col("embedding")),
          x => floor(x * 1048576.0).cast("long").cast("double") *
            floor(x * 1048576.0).cast("long").cast("double"))).as("n2"))
    val joined = proj.join(orig, "vec_id")
      .agg(sum(col("pn2").cast("double") / 16.0).as("p"), sum(col("n2")).as("o"))
      .collect()(0)
    val ratio = joined.getDouble(0) / joined.getDouble(1)
    assert(ratio > 0.8 && ratio < 1.2,
      s"projected/original norm² ratio $ratio outside [0.8, 1.2]")
  }

  test("SQ8 codes are valid int8 range and dequantize within one step") {
    // floor quantization against per-dim [mn, mx]: every code ∈ [0, 255]
    // and mn + q·(mx−mn)/255 under-shoots the true value by < one step.
    // the raw code arrays (the QUERY now emits an md5 signature per
    // vector — DriverShapeSpec forbids top-level arrays in driver
    // outputs — so the bound check reads the shared sq8 frame directly)
    val codes = V.sq8(spark, sf)
    val bad = codes.select(explode(col("qv")).as("q"))
      .filter(col("q") < 0 || col("q") > 255).count()
    assert(bad === 0, s"$bad codes outside [0, 255]")
    assert(codes.count() === Tables.embeddings(spark, sf).count())
    // dequantization error bound, checked on the corpus: recompute the
    // unit vectors and per-dim stats exactly as the encoder does
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), V.vec(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"), V.l2norm(col("v")).as("n"))
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("u"))
    val dims = e.select(posexplode(col("u")).as(Seq("j", "x")))
      .groupBy("j").agg(min("x").as("mn"), max("x").as("mx"))
    val worst = codes.select(col("vec_id"), posexplode(col("qv")).as(Seq("j", "q")))
      .join(e.select(col("vec_id"), posexplode(col("u")).as(Seq("j", "x"))),
        Seq("vec_id", "j"))
      .join(dims, "j")
      .select(((col("x") - (col("mn") + col("q") * (col("mx") - col("mn")) / 255.0))
        / ((col("mx") - col("mn")) / 255.0)).as("errSteps"))
      .agg(max(abs(col("errSteps")))).collect()(0).getDouble(0)
    assert(worst <= 1.0 + 1e-9, s"dequantization error $worst steps > 1")
  }

  test("SQ8 top-k recalls most of the brute-force cosine top-10") {
    // unit-normalization makes quantized-L2 a monotone stand-in for
    // cosine up to quantization error; 8 bits/dim keeps that error far
    // below typical neighbor gaps
    val truth = SparkEntry.queries("ann_bruteforce_topk")(spark, sf)
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("ann_sq8_topk")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val hits = (truth intersect got).size
    assert(hits >= 8, s"SQ8 recall@10 = $hits/10, expected >= 8")
  }
}
