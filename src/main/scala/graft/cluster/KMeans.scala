package graft.cluster

import graft.{Q, Tables}
import graft.ops.Vector._
import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

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
  def assign(e: DataFrame, centroids: DataFrame, maxSim: Boolean = true): DataFrame = {
    val sim = cosine(vec(col("embedding")), col("cv"))
    val ord = if (maxSim) col("sim").desc else col("sim").asc
    val w = Window.partitionBy("vec_id").orderBy(ord, col("cid").asc)
    e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("label"), vec(col("embedding")).as("v"),
        col("cid"), sim.as("sim"))
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
    * assign → recompute → converged when per-cluster counts are stable.
    * Per-iteration localCheckpoint truncates lineage (the reference's
    * "Neo4j as state store" role); cap at maxIter like the reference's 100.
    */
  def run(spark: SparkSession, e: DataFrame, k: Int, maxIter: Int = 100,
          maxSim: Boolean = true): Result = {
    var centroids = initCentroids(e, k).localCheckpoint()
    var prevCounts: Map[Long, Long] = Map.empty
    var assigned: DataFrame = null
    var it = 0
    var done = false
    val corpus = e.localCheckpoint()
    while (!done && it < maxIter) {
      assigned = assign(corpus, centroids, maxSim).localCheckpoint()
      val counts = assigned.groupBy("cid").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      if (counts == prevCounts) done = true
      else {
        prevCounts = counts
        centroids = recompute(assigned).localCheckpoint()
      }
      it += 1
    }
    Result(centroids, assigned, it)
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

  private def sqlCentroids(k: Int): String =
    s"""(SELECT vec_id AS cid, ${sqlVec("embedding")} AS cv FROM embeddings
       | ORDER BY ${detHashSql("vec_id")}, vec_id LIMIT $k)""".stripMargin

  private def sqlAssign(k: Int): String = {
    val c = sqlCosine(sqlVec("e.embedding"), "c.cv")
    s"""SELECT e.vec_id, e.label, e.embedding, c.cid, $c AS sim,
       |       row_number() OVER (PARTITION BY e.vec_id ORDER BY $c DESC, c.cid ASC) AS rk
       |FROM embeddings e, cents c""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    // Q7: deterministic centroid init (hash-ordered k-sample).
    Q(
      "kmeans_init",
      (s, d) => initCentroids(embeddings(s, d), 8).orderBy("cid")
        .select(col("cid"), col("cv").as("centroid")),
      Some(s"""SELECT cid, cv AS centroid FROM ${sqlCentroids(8)} ORDER BY cid""")
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
    // The production path is the VectorMean Aggregator above.
    Q(
      "kmeans_recompute",
      (s, d) => {
        val a = assign(embeddings(s, d), initCentroids(embeddings(s, d), 8))
        a.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg(sort_array(collect_list(col("x"))).as("xs"))
          .select(col("cid"), col("pos"),
            (seqSum(col("xs")) / size(col("xs"))).as("m"))
          .groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            p => p.getField("m")).as("centroid"))
          .orderBy("cid")
      },
      Some(s"""WITH cents AS ${sqlCentroids(8)},
              |scored AS (${sqlAssign(8)}),
              |assigned AS (SELECT vec_id, cid, ${sqlVec("embedding")} AS v FROM scored WHERE rk = 1),
              |ex AS (SELECT cid, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x FROM assigned),
              |dims AS (SELECT cid, pos, list(x ORDER BY x) AS xs FROM ex GROUP BY cid, pos),
              |means AS (SELECT cid, pos, ${sqlSeqSum("xs")} / len(xs) AS m FROM dims)
              |SELECT cid, list(m ORDER BY pos) AS centroid FROM means
              |GROUP BY cid ORDER BY cid""".stripMargin)
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
