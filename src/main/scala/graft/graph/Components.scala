package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list, run
  * distributed to a driver-counted fixpoint — the shared kernel behind
  * `dedup_cluster_canonical` (near-dup clusters over the MinHash pair
  * graph) and the grid fixpoint in `vec_contours`. The reference's
  * equivalent is Neo4j-side traversal; here each iteration is ONE
  * equi-join on the (cached) edges plus ONE partial min-agg — the
  * per-superstep shape Pregel runs at 100 TB.
  *
  * Every generation is eagerly `localCheckpoint`'d: the hop is
  * materialized AND its lineage truncated to a LogicalRDD, so plan depth
  * stays O(1) per iteration instead of nesting one join per generation —
  * a deep-diameter graph (chain corpus, long near-dup chains) converges
  * without planner blowup (EdgeCaseSpec drives a 30-link chain).
  * Superseded generations are dereferenced and reclaimed by the
  * ContextCleaner; the caller owns the edge cache.
  */
object Components {

  /** @param ue undirected edges (src, dst) — both directions present.
    * @return (id, l) — one row per vertex that appears in `ue`, with
    *         l = min vertex id reachable (the component label). */
  def minLabel(ue: DataFrame): DataFrame = {
    val nodes = ue.select(col("src").as("id")).distinct()
    var lbl = nodes.select(col("id"), col("id").as("l"))
    var changed = 1L
    while (changed > 0) {
      val prop = ue
        .join(lbl.select(col("id").as("src"), col("l").as("nl")), "src")
        .groupBy(col("dst")).agg(min("nl").as("ml"))
      // LAZY checkpoint: the convergence count below is a full action
      // over every partition, so it both materializes the generation and
      // truncates its lineage — one job per iteration, not two. (Lazy is
      // safe only because count() is a full scan; partial actions like
      // isEmpty would checkpoint a partition subset.)
      val next = lbl.join(prop, col("id") === col("dst"), "left")
        .select(col("id"), least(col("l"), coalesce(col("ml"), col("l"))).as("l"))
        .localCheckpoint(false)
      changed = next
        .join(lbl.select(col("id").as("id2"), col("l").as("old")), col("id") === col("id2"))
        .filter(col("l") < col("old")).count()
      lbl = next
    }
    lbl
  }
}
