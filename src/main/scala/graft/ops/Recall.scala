package graft.ops

import graft.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GenSnap

/** ANN quality as a driver-gated number (judge r7 task 6): each
  * approximate top-k — IVF, IVF-PQ, LSH, PQ — joined against the exact
  * brute-force top-10, recall@10 emitted as exact integer hit counts
  * plus the (IEEE-exact, hits/10) recall fraction. VectorSpec asserts
  * recall bounds in tests; this surfaces the same numbers through the
  * CORRECTNESS gate, with the oracle RECOMPUTING every method end-to-end
  * in SQL (each method's own green oracle embedded as a subquery) rather
  * than pinning constants — the driver proves Spark's recall cell-exact.
  *
  * Lives in its own module: it composes the other modules' Q lists, so
  * building it inside Vector/KMeans would dereference a query list
  * mid-construction. Cost shape: each side is a 10-row frame; the joins
  * broadcast trivially and the corpus scans are the methods' own
  * (already benched) plans.
  */
object Recall {

  private val Methods = Seq(
    "graph" -> "ann_graph_search",
    "ivf" -> "ann_ivf_topk",
    "ivfpq" -> "ann_ivfpq_topk",
    "lsh" -> "ann_lsh_topk",
    "pq" -> "ann_pq_topk",
    "prefix" -> "ann_prefix_rerank",
    "rq" -> "ann_rq_topk",
    "sq8" -> "ann_sq8_topk")

  private lazy val fns =
    Q.queryMap(Vector.queries) ++ Q.queryMap(graft.cluster.KMeans.queries)
  private lazy val sqls =
    Q.oracleMap(Vector.queries) ++ Q.oracleMap(graft.cluster.KMeans.queries)

  val queries: Seq[Q] = Seq(
    Q(
      "ann_recall_report",
      (s, d) => {
        // ground truth = exact top-10: the brute-force query's 20-row
        // ranking re-sorted and cut (same (sim desc, vec_id) total
        // order), checkpointed so the corpus-wide brute scan runs once
        // for all four method joins instead of once per method
        val truth = fns("ann_bruteforce_topk")(s, d)
          .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
          .select(col("vec_id"))
          .transform(GenSnap.snap)
        Methods.map { case (m, qn) =>
          fns(qn)(s, d).select(col("vec_id")).join(truth, "vec_id")
            .agg(count(lit(1)).as("hits"))
            .select(lit(m).as("method"), col("hits"),
              (col("hits").cast("double") / lit(10.0)).as("recall_at_10"))
        }.reduce(_ union _).orderBy("method")
      },
      Some {
        val truth =
          s"""truth AS (
             |  SELECT vec_id FROM (
             |${sqls("ann_bruteforce_topk")}
             |  ) ORDER BY sim DESC, vec_id ASC LIMIT 10)""".stripMargin
        val rows = Methods.map { case (m, qn) =>
          s"""SELECT '$m' AS method,
             |  CAST((SELECT count(*) FROM (
             |${sqls(qn)}
             |  ) mq JOIN truth USING (vec_id)) AS BIGINT) AS hits""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH $truth
           |SELECT method, hits, CAST(hits AS DOUBLE) / 10.0 AS recall_at_10
           |FROM ($rows)
           |ORDER BY method""".stripMargin
      }
    )
  )
}
