package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GenSnap

/** Min-label connected components over an undirected edge list, run
  * distributed to a driver-counted fixpoint — the shared kernel behind
  * `dedup_cluster_canonical` (near-dup clusters over the MinHash pair
  * graph) and the grid fixpoint in `vec_contours`. The reference's
  * equivalent is Neo4j-side traversal; here each iteration is ONE
  * equi-join on the (cached) edges plus ONE partial min-agg — the
  * per-superstep shape Pregel runs at 100 TB.
  *
  * Every generation is snapshot through [[GenSnap.snap]] (a lazy
  * `localCheckpoint` whose carried stats estimate is capped — the
  * convergence count materializes it in the same job): the hop is
  * materialized AND its lineage truncated to a LogicalRDD, so plan depth
  * stays O(1) per iteration instead of nesting one join per generation —
  * a deep-diameter graph (chain corpus, long near-dup chains) converges
  * without planner blowup (EdgeCaseSpec drives a 30-link chain). The
  * stats cap keeps PLANNING cost O(1) too: each merge joins the
  * generation against a frame derived from itself, which squares the
  * size-only estimate per round — uncapped, the BigInt digit count
  * doubles per generation (see GenSnap's Scaladoc for the measured
  * Borůvka blowup).
  *
  * The per-round driver `count()` is NOT removable by checking
  * convergence every second round: the count is the one full action
  * that materializes the LAZY localCheckpoint, so skipping it would
  * either leave a generation unmaterialized (plan depth grows again) or
  * force eager checkpoints (two jobs per round — strictly worse). One
  * job per round is already the minimum for a driver-counted fixpoint.
  * Superseded generations are dereferenced and reclaimed by the
  * ContextCleaner; the caller owns the edge cache.
  */
object Components {

  /** Packed deterministic vote argmax (r17 optimization round, guide
    * §1.2 step 2): LPA's tie rule max(struct(cnt, -label)) plans as a
    * SortAggregate — struct orderings are not hash-aggregable, and the
    * probe showed the per-superstep vote sorts as graph_lpa_converged's
    * top stages. With labels < 2^21 (always vertex ids here, loudly
    * require'd by callers) and per-(dst, label) vote counts ≤ degree <
    * |V| < 2^21, the total order packs into ONE BIGINT
    * cnt·2^21 + (2^21−1−label), whose plain max IS the lexicographic
    * (cnt DESC, ties to the smallest label) winner — HashAggregate-
    * planned, decoded by exact mask arithmetic, bit-identical labels. */
  private val VotePackLim = 1L << 21
  private def votePack(cnt: Column, nl: Column): Column =
    cnt * lit(VotePackLim) + (lit(VotePackLim - 1) - nl)
  private def voteUnpack(pk: Column): Column =
    lit(VotePackLim - 1) - pk.bitwiseAND(lit(VotePackLim - 1))
  /** A plan is an acceptable PRE-STAGED edge artifact when its root is
    * a checkpoint leaf, possibly under projections/filters only (r17:
    * the consolidated master edge leaf serves undirectedEdges et al. as
    * column projections — a projection of a materialized leaf scans at
    * RDD cost and cannot reintroduce the per-superstep build shuffle
    * this precondition exists to catch; any join/aggregate/exchange
    * in the lineage still fails it). */
  private def stagedView(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project => stagedView(pr.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => stagedView(f.child)
      // hot leaves carry a no-broadcast ResolvedHint (GenSnap) — a
      // transparent unary wrapper over the materialized leaf
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => stagedView(h.child)
      case _ => false
    }

  private def requireVoteDomain(nodes: DataFrame, who: String): Unit = {
    val r = nodes.agg(max(col("id"))).head()
    if (!r.isNullAt(0))
      require(r.getLong(0) < VotePackLim,
        s"$who packed-vote domain: max vertex id ${r.getLong(0)} >= 2^21 — " +
          "widen the vote encoding before ids this large")
  }

  /** @param ue undirected edges (src, dst) — both directions present.
    * @return (id, l) — one row per vertex that appears in `ue`, with
    *         l = min vertex id reachable (the component label). */
  def minLabel(ue: DataFrame): DataFrame = {
    // zero-exchange generation discipline (see [[lpaConverged]]): labels
    // are hash(id)-partitioned once up front; the propagation agg output
    // is hash(dst) (≡ id after the alias), so the merge left-join, the
    // next round's frontier join (when ue is src-partitioned), and the
    // generation's own partitioning plan without exchanges — each round
    // pays the one min-agg shuffle. Change detection is fused into the
    // merge as a boolean, so the per-round driver count is a filter over
    // the just-materialized generation, not a join job.
    // the distinct's own agg exchange already leaves this hash(id)
    val nodes = ue.select(col("src").as("id")).distinct()
    var lbl = nodes.select(col("id"), col("id").as("l"), lit(false).as("ch"))
      .transform(GenSnap.snap)
    var changed = 1L
    var iters = 0
    while (changed > 0) {
      val prop = ue
        .join(lbl.select(col("id").as("src"), col("l").as("nl")), "src")
        .groupBy(col("dst")).agg(min("nl").as("ml"))
      // LAZY checkpoint: the convergence count below is a full action
      // over every partition, so it both materializes the generation and
      // truncates its lineage — one job per iteration, not two. (Lazy is
      // safe only because count() is a full scan; partial actions like
      // isEmpty would checkpoint a partition subset.)
      lbl = lbl.join(prop, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("l"), coalesce(col("ml"), col("l"))).as("l"),
          (col("ml") < col("l")).as("chRaw"))
        .select(col("id"), col("l"), coalesce(col("chRaw"), lit(false)).as("ch"))
        .transform(GenSnap.snap)
      changed = lbl.filter(col("ch")).count()
      iters += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[minLabel] iters=$iters")
    lbl.select(col("id"), col("l"))
  }

  /** [[minLabel]] lifted to a DIRECTED edge list with an explicit vertex
    * set: l(v) converges to min{u : u reaches v along edge direction}
    * (including v itself). The explicit `nodes` frame matters because a
    * directed graph has sink-only vertices that never appear as `src`;
    * propagation, merge, change-fusion, and the lazy-localCheckpoint +
    * drain-count discipline are exactly [[minLabel]]'s — one equi-join +
    * one partial min-agg + one count job per round, O(1) plan depth.
    * Convergence takes one round per hop of the longest shortest
    * label-carrying path (the directed diameter), so callers should keep
    * that bounded by graph design (the SCC chain graph measures ~15
    * rounds at sf0.1).
    *
    * @param nodes (id) — every vertex of the subgraph.
    * @param de    directed edges (src, dst) — NOT symmetrized.
    * @return (id, l) with l = min forward-reaching vertex id. */
  def minLabelDirected(nodes: DataFrame, de: DataFrame): DataFrame = {
    var lbl = nodes.select(col("id"), col("id").as("l"), lit(false).as("ch"))
      .transform(GenSnap.snap)
    var changed = 1L
    while (changed > 0) {
      val prop = de
        .join(lbl.select(col("id").as("src"), col("l").as("nl")), "src")
        .groupBy(col("dst")).agg(min("nl").as("ml"))
      lbl = lbl.join(prop, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("l"), coalesce(col("ml"), col("l"))).as("l"),
          (col("ml") < col("l")).as("chRaw"))
        .select(col("id"), col("l"), coalesce(col("chRaw"), lit(false)).as("ch"))
        .transform(GenSnap.snap)
      changed = lbl.filter(col("ch")).count()
    }
    lbl.select(col("id"), col("l"))
  }

  /** Set reachability: every vertex reachable from ANY seed along the
    * directed edges (seeds included) — plain frontier BFS with a settled
    * anti-join, all seeds in one dataflow (no per-seed keying, unlike
    * [[multiBfs]] — the result is the UNION of cones, which is what
    * bowtie/impact analyses consume). Lazy-localCheckpoint + drain-count
    * discipline; `maxHops` is a loud diameter bound, never a silent
    * truncation. */
  def reachableFrom(seeds: DataFrame, de: DataFrame, maxHops: Int): DataFrame = {
    var settled = seeds.select(col("id")).distinct().transform(GenSnap.snap)
    var frontier = settled
    var hops = 0
    var drained = frontier.isEmpty
    while (!drained) {
      hops += 1
      require(hops <= maxHops,
        s"reachability frontier still live past $maxHops hops — raise the bound")
      val next = de
        .join(frontier.select(col("id").as("src")), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .transform(GenSnap.snap)
      if (next.count() == 0L) drained = true
      else {
        settled = settled.union(next).transform(GenSnap.snap)
        frontier = next
      }
    }
    settled
  }

  /** Longest-path layering of a DAG: layer(v) = length of the longest
    * directed path ending at v (sources sit at 0) — the level structure
    * a topological schedule executes, computed by (max, +1) relaxation
    * to a driver-counted fixpoint (the [[minLabelDirected]] kernel in
    * the tropical semiring; converges in ≤ DAG-depth rounds). The
    * `maxIters` require doubles as the ACYCLICITY check: a cycle
    * relaxes forever, so hitting the bound is a loud contract failure,
    * never an infinite loop.
    *
    * @return (id, layer) for every vertex in `nodes`. */
  def dagLayers(nodes: DataFrame, de: DataFrame, maxIters: Int): DataFrame = {
    var lbl = nodes.select(col("id"), lit(0).as("l"), lit(false).as("ch"))
      .transform(GenSnap.snap)
    var changed = 1L
    var iters = 0
    while (changed > 0) {
      iters += 1
      require(iters <= maxIters,
        s"DAG layering still relaxing after $maxIters rounds — " +
          "the input has a cycle or the depth bound is too low")
      val prop = de
        .join(lbl.select(col("id").as("src"), col("l").as("nl")), "src")
        .groupBy(col("dst")).agg((max("nl") + 1).as("ml"))
      lbl = lbl.join(prop, col("id") === col("dst"), "left")
        .select(col("id"),
          greatest(col("l"), coalesce(col("ml"), col("l"))).as("l"),
          (col("ml") > col("l")).as("chRaw"))
        .select(col("id"), col("l"), coalesce(col("chRaw"), lit(false)).as("ch"))
        .transform(GenSnap.snap)
      changed = lbl.filter(col("ch")).count()
    }
    graft.tools.BoundProbe.record("dag_layers", iters, maxIters)
    lbl.select(col("id"), col("l").as("layer"))
  }

  /** Strongly connected components by deterministic forward-backward
    * coloring (the Orzan / Fleischer–Hendrickson–Pinar family — the
    * parallel-native SCC; Tarjan's single DFS is inherently sequential
    * and never scales out). Each outer round:
    *
    *   1. FORWARD coloring: [[minLabelDirected]] gives every remaining
    *      vertex the color c(v) = min id that reaches it. A vertex with
    *      c(v) = v is a ROOT (nothing smaller reaches it) — the round's
    *      pivot set, one pivot per color, all colors in one dataflow.
    *   2. BACKWARD BFS within each color class: SCC(r) for a root r is
    *      exactly the vertices of color r that reach r. Because color
    *      classes partition the remaining graph, all roots sweep
    *      together: keep edges whose endpoints share a color, reverse
    *      them, BFS from the root set — one equi-join + one distinct +
    *      one anti-join per hop for every root at once (the [[multiBfs]]
    *      superstep budget).
    *   3. Peel every settled SCC, drop their edges, repeat.
    *
    * The global min-id vertex is always a root, so every round peels ≥ 1
    * SCC; min-id pivots make rounds — and therefore the output — fully
    * deterministic and oracle-replayable. The definitional oracle (SCC
    * label = min over mutually-reachable set) needs no round replay at
    * all. Everything is hash-partitioned equi-joins + partial aggs;
    * driver state is only the round counter and drain counts.
    *
    * @param nodes     (id) — the vertex set.
    * @param de        directed edges (src, dst).
    * @param maxRounds loud bound on outer peel rounds.
    * @return ((id, scc) — scc = min id of v's SCC; outer rounds run). */
  def sccColoring(nodes: DataFrame, de: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    var rem = nodes.select(col("id")).transform(GenSnap.snap)
    var edges = de.select(col("src"), col("dst")).transform(GenSnap.snap)
    var out: DataFrame = null
    var rounds = 0
    var live = rem.count() > 0
    while (live) {
      rounds += 1
      require(rounds <= maxRounds,
        s"SCC coloring still live past $maxRounds peel rounds — raise the bound")
      val lbl = minLabelDirected(rem, edges) // (id, l): forward min color
      // same-color edges, reversed: BFS follows them from the roots; the
      // join keys the frontier on the ORIGINAL dst, so settle state is
      // (vertex, its color) and colors never mix across classes.
      val ec = edges
        .join(lbl.select(col("id").as("src"), col("l").as("cs")), "src")
        .join(lbl.select(col("id").as("dst"), col("l").as("cd")), "dst")
        .filter(col("cs") === col("cd"))
        .select(col("src"), col("dst"), col("cs").as("c"))
        .transform(GenSnap.snap)
      var settled = lbl.filter(col("id") === col("l"))
        .select(col("id"), col("l").as("c"))
        .transform(GenSnap.snap)
      var frontier = settled
      var drained = frontier.count() == 0 // roots always exist while rem ≠ ∅
      while (!drained) {
        // join on dst alone: ec carries c = color(dst) already (both
        // endpoints share a color by construction), so the frontier side
        // needs only its vertex ids
        val next = ec
          .join(frontier.select(col("id").as("dst")), Seq("dst"))
          .select(col("src").as("id"), col("c")).distinct()
          .join(settled.select(col("id")), Seq("id"), "left_anti")
          .transform(GenSnap.snap)
        if (next.count() == 0L) drained = true
        else {
          settled = settled.union(next).transform(GenSnap.snap)
          frontier = next
        }
      }
      val assigned = settled.select(col("id"), col("c").as("scc"))
      out = if (out == null) assigned else out.union(assigned)
      rem = rem.join(assigned.select(col("id")), Seq("id"), "left_anti")
        .transform(GenSnap.snap)
      live = rem.count() > 0
      if (live)
        edges = edges
          .join(assigned.select(col("id").as("src")), Seq("src"), "left_anti")
          .join(assigned.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .transform(GenSnap.snap)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[scc] round=$rounds")
    }
    graft.tools.BoundProbe.record("scc_coloring", rounds, maxRounds)
    val res =
      if (out == null) nodes.select(col("id"), col("id").as("scc")).limit(0)
      else out
    (res, rounds)
  }

  /** Synchronous label-propagation (Raghavan et al. 2007), made fully
    * deterministic: each round every vertex adopts the most frequent
    * label among its NEIGHBORS (no self-vote), ties toward the smallest
    * label — max over (cnt, -label) structs is lexicographic, exactly
    * `ORDER BY cnt DESC, label ASC`. Runs a FIXED number of supersteps
    * (no convergence test): synchronous LPA can oscillate (notably on
    * bipartite graphs), so a fixed depth is both the determinism the
    * oracle needs and the standard mitigation. Per superstep: one
    * equi-join + two partial-agg'd hash aggregations, frontier lazily
    * localCheckpoint'd — the same O(1)-plan-depth superstep shape as
    * [[minLabel]].
    *
    * @param nodes      (id) — every vertex, including isolated ones
    *                   (they keep their own label).
    * @param ue         undirected edges (src, dst) — both directions
    *                   present.
    * @param stageEdges when true (default) the edge list is shuffled
    *                   onto the join key and checkpointed here; pass
    *                   false when the caller supplies an ALREADY staged
    *                   (src-partitioned, persisted) adjacency — e.g. the
    *                   session-scoped memo in PropertyGraph — so it is
    *                   not re-shuffled per call.
    * @return (id, l) after exactly `iters` supersteps. */
  def lpa(nodes: DataFrame, ue: DataFrame, iters: Int,
          stageEdges: Boolean = true): DataFrame = {
    // the edge list is loop-invariant: shuffle it onto the JOIN key once
    // and localCheckpoint (lazily — the first superstep's join
    // materializes it). LogicalRDD keeps the hash partitioning, so every
    // later superstep shuffles only the label frontier (|V| rows), not
    // the edges (|E| rows) — the persisted-adjacency shape
    // graph_pagerank_exact uses, measured 7.0 s → ~4.3 s warm at sf0.1
    // under concurrent external load (per-superstep cost is then on par
    // with a pagerank_exact superstep, which is the floor this shape
    // targets).
    val ueBySrc =
      if (stageEdges) ue.repartition(col("src")).transform(GenSnap.snap)
      else {
        // precondition (r8 advice): a caller claiming pre-staged edges
        // must pass a persisted artifact (cache()'d or a checkpoint
        // LogicalRDD) — an unstaged frame would give correct results
        // while silently reintroducing the per-superstep full-edge
        // shuffle this flag exists to avoid, so fail loudly instead.
        // the frame itself must be the persisted artifact: cache()'d, or a
        // checkpoint LogicalRDD at the plan ROOT — a lineage-wide exists()
        // would accept any unpersisted derivative of a checkpointed frame
        // and silently reintroduce the per-superstep full-edge shuffle
        val persisted = ue.storageLevel != org.apache.spark.storage.StorageLevel.NONE ||
          stagedView(ue.queryExecution.analyzed)
        require(persisted,
          "lpa(stageEdges = false) requires a persisted, src-partitioned edge list " +
            "(cache() or localCheckpoint it, e.g. PropertyGraph.undirectedEdges)")
        ue
      }
    // zero-exchange generation discipline (see [[lpaConverged]]): the
    // label frame is hash(id)-partitioned once; `best` comes out of its
    // by-dst agg hash(dst) (≡ id after the alias), so the merge
    // left-join — non-voters, i.e. isolated vertices, coalesce to their
    // current label — the next superstep's frontier join, and the
    // generation's partitioning all plan with no exchange. Each
    // superstep pays exactly the two partial-agg'd vote shuffles; no
    // isolated-vertex anti-join, no union.
    var lbl = nodes.select(col("id"), col("id").as("l"))
      .repartition(col("id"))
      .transform(GenSnap.snap)
    requireVoteDomain(nodes, "lpa")
    for (_ <- 1 to iters) {
      // ONE exchange per vote (r18, guide §2.4): hash(dst) satisfies
      // the clustered distribution of BOTH the (dst, nl) count and the
      // by-dst argmax, so an explicit dst repartition lets the two
      // aggregations run partition-local over a single shuffle instead
      // of one exchange each. Counts and the packed max are unchanged.
      val votes = ueBySrc
        .join(lbl.select(col("id").as("src"), col("l").as("nl")), "src")
        .repartition(col("dst"))
        .groupBy(col("dst"), col("nl")).agg(count(lit(1)).as("cnt"))
      val best = votes.groupBy(col("dst"))
        .agg(max(votePack(col("cnt"), col("nl"))).as("pk"))
        .select(col("dst").as("id"), voteUnpack(col("pk")).as("bl"))
      // kernel-plan dump (VERDICT-r17 task 8): the one-exchange vote claim
      if (sys.env.contains("GRAFT_EXPLAIN_KERNELS")) best.explain("formatted")
      lbl = lbl.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("bl"), col("l")).as("l"))
        .transform(GenSnap.snap)
    }
    lbl
  }

  /** One [[lpaConverged]] run: the final labels plus the per-superstep
    * changed-vertex counts (length = supersteps executed; a trailing 0
    * means the run CONVERGED rather than hit the cap). */
  final case class LpaRun(labels: DataFrame,
                          changeCounts: Seq[Long]) {
    def rounds: Int = changeCounts.size
    def converged: Boolean = changeCounts.lastOption.contains(0L)
  }

  /** Convergence-mode LPA — the usable community detector next to the
    * fixed-depth oracle form [[lpa]]. SEMI-SYNCHRONOUS (Cordasco &
    * Gargano 2012): each superstep updates the vertices one color class
    * at a time (two half-steps for a 2-coloring), each half-step voting
    * over the LATEST labels. When `color` is a proper coloring — e.g.
    * the bipartition side of a bipartite graph — no vertex ever votes
    * with a stale neighbor label, which removes the 2-cycle label
    * oscillation synchronous LPA exhibits on bipartite structure (the
    * reason [[lpa]] runs a fixed depth). Votes and ties stay exactly
    * [[lpa]]'s deterministic rule: most frequent neighbor label, ties
    * toward the smallest.
    *
    * Termination is a driver-counted change fixpoint: stop when a full
    * superstep changes 0 labels, with two guards for improper colorings
    * (where semi-sync convergence is only empirical): a hard `maxIters`
    * cap and an oscillation cap (3 consecutive non-decreasing change
    * counts). Change counts are also require'd non-explosive (≤ 2× the
    * previous superstep past a small floor) — a diverging count means
    * the coloring is fighting the vote rule and the caller should pass
    * a proper coloring instead.
    *
    * Per half-step: the edge scan is pre-filtered to the updating
    * color's dst rows (so a full superstep touches each edge ONCE, same
    * vote volume as a synchronous step) and the two vote aggregations
    * stay partial-agg'd — the ONLY two exchanges in a half-step. The
    * initial label frame is hash-partitioned on id once; each generation
    * is then `lbl LEFT JOIN best` — both sides already hash(id) (best
    * via its final by-dst agg + alias-aware partitioning), so the merge
    * join, the next half-step's vote-join frontier (id aliased to src),
    * and the generation's partitioning itself all plan with NO exchange:
    * no isolated-vertex precompute, no union, no repartition. Change
    * detection is FUSED into the merge as a boolean column (coalesce
    * carries unvoted vertices, resetting stale flags in half-step 1), so
    * the per-superstep driver count is a filter over the
    * just-materialized generation, not a separate join job — one action
    * per superstep, O(1) plan depth, the [[minLabel]] discipline.
    *
    * @param color 0/1 color of a vertex id column; DEFAULT id parity
    *              (improper in general — the caps then bound the run);
    *              pass the true bipartition for bipartite graphs.
    * @return final labels plus the change-count trace (monotone
    *         evidence for the caller to assert on). */
  def lpaConverged(nodes: DataFrame, ue: DataFrame, maxIters: Int = 30,
      color: Column => Column = pmod(_, lit(2)),
      stageEdges: Boolean = true): LpaRun = {
    val ueBySrc =
      if (stageEdges) ue.repartition(col("src")).transform(GenSnap.snap)
      else {
        // the frame itself must be the persisted artifact: cache()'d, or a
        // checkpoint LogicalRDD at the plan ROOT — a lineage-wide exists()
        // would accept any unpersisted derivative of a checkpointed frame
        // and silently reintroduce the per-superstep full-edge shuffle
        val persisted = ue.storageLevel != org.apache.spark.storage.StorageLevel.NONE ||
          stagedView(ue.queryExecution.analyzed)
        require(persisted,
          "lpaConverged(stageEdges = false) requires a persisted, src-partitioned " +
            "edge list (cache() or localCheckpoint it, e.g. PropertyGraph.undirectedEdges)")
        ue
      }
    var lbl = nodes.select(col("id"), col("id").as("l"), lit(false).as("ch"))
      .repartition(col("id"))
      .transform(GenSnap.snap)
    requireVoteDomain(nodes, "lpaConverged")
    val history = scala.collection.mutable.ArrayBuffer.empty[Long]
    var live = true
    while (live && history.size < maxIters) {
      for (c <- 0 to 1) {
        // same one-exchange vote shape as [[lpa]] (r18, guide §2.4)
        val votes = ueBySrc.filter(color(col("dst")) === c)
          .join(lbl.select(col("id").as("src"), col("l").as("nl")), "src")
          .repartition(col("dst"))
          .groupBy(col("dst"), col("nl")).agg(count(lit(1)).as("cnt"))
        val best = votes.groupBy(col("dst"))
          .agg(max(votePack(col("cnt"), col("nl"))).as("pk"))
          .select(col("dst").as("id"), voteUnpack(col("pk")).as("bl"))
        // merge = one zero-exchange left join: vertices best covers (the
        // updating color's non-isolated set) take the vote winner; every
        // other vertex — the other color AND this color's isolated
        // vertices — coalesces to its current label. Half-step 1 resets
        // the previous superstep's stale flags on unvoted rows;
        // half-step 2 carries half-step 1's.
        val carryCh = if (c == 0) lit(false) else col("ch")
        lbl = lbl
          .join(best, Seq("id"), "left")
          .select(col("id"), coalesce(col("bl"), col("l")).as("l"),
            when(col("bl").isNotNull, col("bl") =!= col("l"))
              .otherwise(carryCh).as("ch"))
          .transform(GenSnap.snap)
      }
      val changed = lbl.filter(col("ch")).count()
      if (history.nonEmpty)
        require(changed <= math.max(2L * history.last, 16L),
          s"LPA change count exploded (${history.last} -> $changed): the " +
            "coloring is fighting the vote rule; pass a proper coloring")
      history += changed
      if (sys.env.contains("LPA_DEBUG"))
        System.err.println(s"[lpaConverged] superstep=${history.size} changed=$changed")
      val oscillating = history.size >= 3 &&
        changed > 0 && changed >= history(history.size - 2) &&
        history(history.size - 2) >= history(history.size - 3)
      if (changed == 0 || oscillating) live = false
    }
    LpaRun(lbl.select(col("id"), col("l")), history.toSeq)
  }

  /** Min-plus single-source shortest paths over a weighted undirected
    * edge list — the same relaxation kernel as [[minLabel]] lifted from
    * the (min, id) semiring to (min, +): Bellman-Ford frontier rounds to
    * a driver-counted fixpoint, one equi-join + one partial min-agg per
    * round, every generation lazily localCheckpoint'd and materialized
    * by the convergence count (one job per round, O(1) plan depth).
    * The distance frontier stays SPARSE (only reached vertices carry a
    * row) so there is no +∞ sentinel to overflow.
    *
    * @param ue weighted undirected edges (src, dst, w) — both
    *           directions present, w a non-negative integer (long).
    * @return (dist, rounds): dist = (id, d) exact shortest distances
    *         for every vertex reachable from `src`; rounds = relaxation
    *         rounds until no distance improved (callers with an
    *         unrolled-CTE oracle must assert rounds ≤ their unroll
    *         depth, or the oracle under-relaxes). */
  /** k-core decomposition by iterative degree peeling — a third
    * fixpoint shape next to [[minLabel]] (label spreading) and
    * [[minDist]] (min-plus relaxation): here the EDGE SET itself
    * shrinks monotonically. Each round: one partial-agg degree count,
    * drop every vertex with degree < k (two anti joins, build side
    * broadcast when small), repeat until no vertex falls below k.
    * Same lazy-localCheckpoint discipline — each generation's lineage
    * truncates, and the next round's driver count materializes it —
    * so plan depth stays O(1) at any peel depth.
    *
    * @param ue undirected edges (src, dst), both directions present.
    * @return (edges, rounds): the surviving k-core edge set (still both
    *         directions) and the peel rounds to convergence (callers
    *         with an unrolled-CTE oracle must assert rounds ≤ unroll).
    */
  def kCorePeel(ue: DataFrame, k: Int): (DataFrame, Int) = {
    val BcastMax = 1000000L
    var edges = ue.transform(GenSnap.snap)
    var rounds = 0
    var live = true
    while (live) {
      rounds += 1
      val bad = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k).select(col("src").as("v"))
        .transform(GenSnap.snap)
      val nBad = bad.count() // materializes bad AND the current edge gen
      if (nBad == 0) live = false
      else {
        val b = if (nBad <= BcastMax) broadcast(bad) else bad
        edges = edges
          .join(b.select(col("v").as("src")), Seq("src"), "left_anti")
          .join(b.select(col("v").as("dst")), Seq("dst"), "left_anti")
          .select("src", "dst")
          .transform(GenSnap.snap)
      }
    }
    (edges, rounds)
  }

  /** Multi-source BFS: run |seeds| breadth-first searches in ONE
    * dataflow, frontier keyed (lm, id) — each hop is one equi-join +
    * one distinct + one anti-join against the settled set regardless of
    * how many sources run together. This is the shape that makes
    * landmark-distance / closeness-centrality sampling affordable at
    * 100 TB: S sources cost one superstep sequence, not S of them
    * (Eppstein–Wang style sampling composes directly on top). Same
    * lazy-localCheckpoint + drain-count discipline as [[minLabel]]:
    * one job per hop, O(1) plan depth.
    *
    * @param ue       undirected edges (src, dst), both directions.
    * @param seeds    source vertex ids (the `lm` key of the result).
    * @param maxDepth loud upper bound: `require`s the frontier drains
    *                 before this depth (callers share the bound with
    *                 their unrolled/recursive oracle).
    * @return (lm, id, d) — exact hop distance from each seed to every
    *         vertex it reaches; includes (lm, lm, 0). */
  def multiBfs(ue: DataFrame, seeds: Seq[Long], maxDepth: Int): DataFrame = {
    val spark = ue.sparkSession
    import spark.implicits._
    var frontiers = List(seeds.map(lm => (lm, lm, 0)).toDF("lm", "id", "d"))
    var depth = 0
    var drained = false
    while (!drained && depth < maxDepth) {
      depth += 1
      val settled = frontiers.reduce(_ union _).select("lm", "id")
      // LAZY localCheckpoint + count: the drain check is a full scan, so
      // it materializes the hop AND truncates its lineage to a
      // LogicalRDD in ONE job per hop — plan depth stays O(1) per hop
      // instead of nesting every prior anti-join.
      val next = frontiers.head.join(ue, frontiers.head("id") === ue("src"))
        .select(col("lm"), ue("dst").as("id")).distinct()
        .join(settled, Seq("lm", "id"), "left_anti")
        .select(col("lm"), col("id"), lit(depth).as("d"))
        .transform(GenSnap.snap)
      if (next.count() == 0L) drained = true
      else frontiers ::= next
    }
    require(drained, s"BFS frontier still live at depth bound $maxDepth — " +
      "oracle would under-report; raise the bound")
    graft.tools.BoundProbe.record("multi_bfs", depth, maxDepth)
    frontiers.reduce(_ union _)
  }

  /** Multi-source shortest-path COUNTING — the forward pass of Brandes'
    * betweenness algorithm: σ(s, v) = number of distinct shortest s→v
    * paths, computed level-synchronously (σ of a newly-settled vertex is
    * the SUM of σ over its frontier predecessors). Same frontier shape
    * as [[multiBfs]] with the distinct swapped for a partial-agg'd sum —
    * still one equi-join + one aggregation + one anti-join per hop for
    * ALL sources together. σ values are exact BIGINTs; the caller gets a
    * loud overflow margin check (counts ≥ 2^40 abort rather than wrap
    * differently from a raising oracle engine).
    *
    * @return (lm, id, d, sigma) — hop distance and shortest-path count
    *         from each seed to every vertex it reaches; (lm, lm, 0, 1)
    *         included. */
  def multiBfsCounts(ue: DataFrame, seeds: Seq[Long], maxDepth: Int): DataFrame = {
    val spark = ue.sparkSession
    import spark.implicits._
    var frontiers = List(seeds.map(lm => (lm, lm, 0, 1L)).toDF("lm", "id", "d", "sigma"))
    var depth = 0
    var drained = false
    while (!drained && depth < maxDepth) {
      depth += 1
      val settled = frontiers.reduce(_ union _).select("lm", "id")
      val next = frontiers.head.join(ue, frontiers.head("id") === ue("src"))
        .select(col("lm"), ue("dst").as("id"), col("sigma"))
        .join(settled, Seq("lm", "id"), "left_anti")
        .groupBy("lm", "id").agg(sum("sigma").as("sigma"))
        .select(col("lm"), col("id"), lit(depth).as("d"), col("sigma"))
        .transform(GenSnap.snap)
      if (next.count() == 0L) drained = true
      else frontiers ::= next
    }
    require(drained, s"σ frontier still live at depth bound $maxDepth — " +
      "an unrolled oracle would under-count; raise the bound")
    graft.tools.BoundProbe.record("multi_bfs_counts", depth, maxDepth)
    val all = frontiers.reduce(_ union _)
    val maxSigma = all.agg(max("sigma")).head().getLong(0)
    require(maxSigma < (1L << 40),
      s"max σ = $maxSigma approaches BIGINT wrap — path counts on this " +
        "graph need a wider (decimal) accumulator")
    all
  }

  /** Betweenness centrality over the given sources — Brandes' backward
    * dependency sweep on top of [[multiBfsCounts]]'s σ tower:
    * δ(v) = Σ over true successors w (d(w) = d(v)+1, edge v–w) of
    * (σv/σw)·(1+δw), swept from the deepest BFS level down;
    * B(v) = Σ over sources of δ(v), v ≠ source. Exact over the given
    * seed set (sampled-source betweenness when seeds ⊂ V — the
    * Brandes–Pich estimate).
    *
    * The per-vertex float fold is DETERMINISTIC (and therefore
    * oracle-hashable): each vertex folds its successor contributions in
    * sorted successor-id order (sort_array + aggregate; every
    * contribution is positive so a 0.0 init is bit-identical to a
    * first-element init). Per backward level: one equi-join against the
    * adjacency + one partial-agg'd grouped fold — the same superstep
    * budget as the forward pass, all sources at once.
    *
    * @return (id, bc) for every vertex reached by any seed. */
  def betweenness(ue: DataFrame, seeds: Seq[Long], maxDepth: Int,
                  tower: Option[DataFrame] = None): DataFrame = {
    // callers that also serve the σ tower directly (graph_path_counts)
    // pass the shared memoized frame; a fresh one is checkpointed so
    // each backward level reads a materialization, not the BFS lineage
    val fc = tower.getOrElse(multiBfsCounts(ue, seeds, maxDepth)
      .transform(GenSnap.snap))
    // Sweep from the DEEPEST OCCUPIED level, not the caller's loud
    // bound: the bound is a drain guarantee (typically ~2× the real BFS
    // depth), and every level between them is empty — yet each one used
    // to cost two joins, a grouped fold and a checkpoint job. One 1-row
    // agg on the materialized tower buys back those supersteps (≈ half
    // the backward sweep on this graph). Levels past dmax contribute
    // nothing, so the result — and the unrolled oracle's hash — is
    // unchanged.
    val dmax = fc.agg(max(col("d"))).head().getInt(0)
    var levels = List(fc.filter(col("d") === dmax)
      .select(col("lm"), col("id"), col("sigma"), lit(0.0).as("delta")))
    for (k <- dmax - 1 to 0 by -1) {
      val vk = fc.filter(col("d") === k)
        .select(col("lm").as("vlm"), col("id").as("vid"), col("sigma").as("sv"))
      val succ = levels.head.select(col("lm").as("slm"), col("id").as("w"),
        col("sigma").as("sw"), col("delta").as("dw"))
      // The sorted-successor float fold as a WINDOW running sum (r18):
      // sort_array(collect_list(struct)) + an interpreted aggregate HOF
      // planned as ObjectHashAggregate and was the query family's top
      // CPU (two ~0.7 s/task stages, ~38 s summed executor CPU at
      // sf0.1). A running sum over (vlm, vid) ordered by w adds the
      // SAME doubles in the SAME left-fold order (w is unique within a
      // group — distinct successors — and every contribution is
      // positive, so the running maximum IS the final fold value), in
      // codegen. The trailing max rides the window's partitioning, so
      // no exchange is added. Bit-identical to the HOF fold and the
      // oracle's list_reduce.
      val wf = Window.partitionBy("vlm", "vid").orderBy("w")
        .rowsBetween(Window.unboundedPreceding, 0)
      val contrib = vk.join(ue, col("vid") === ue("src"))
        .join(succ, col("slm") === col("vlm") && ue("dst") === col("w"))
        .select(col("vlm"), col("vid"), col("w"),
          ((col("sv").cast("double") / col("sw").cast("double"))
            * (lit(1.0) + col("dw"))).as("c"))
        .withColumn("cum", sum("c").over(wf))
        .groupBy(col("vlm"), col("vid")).agg(max("cum").as("delta"))
      // kernel-plan dump (VERDICT-r17 task 8: per-superstep plans hide
      // behind checkpoint leaves — dump the aggregation's OWN shape)
      if (k == dmax - 1 && sys.env.contains("GRAFT_EXPLAIN_KERNELS"))
        contrib.explain("formatted")
      levels ::= vk.join(contrib, Seq("vlm", "vid"), "left")
        .select(col("vlm").as("lm"), col("vid").as("id"),
          col("sv").as("sigma"), coalesce(col("delta"), lit(0.0)).as("delta"))
        .transform(GenSnap.snap)
    }
    // levels was built by PREPENDING from the deepest level down, so it
    // reads [d0, d1, …, dmax]; drop the head (d0 = the seeds — Brandes
    // accumulates δ only over v ≠ source). A degenerate tower (every
    // seed isolated: dmax = 0) has no non-source vertices and an empty
    // betweenness result.
    val alld =
      if (levels.tail.isEmpty)
        levels.head.limit(0)
      else levels.tail.reduce(_ union _)
    val bc = seeds.map(lm =>
        coalesce(max(when(col("lm") === lm, col("delta"))), lit(0.0)))
      .reduce(_ + _)
    alld.groupBy("id").agg(bc.as("bc"))
  }

  /** Luby's maximal-independent-set, derandomized: in each round a
    * remaining vertex joins the MIS iff its priority is strictly
    * smaller than every remaining neighbor's, where priority
    * p(v, r) = hash(v, r)·2^21 + v is a DETERMINISTIC unique BIGINT
    * (id < 2^21 keeps it inside 2^53 — exact on any engine) — Luby's
    * coin flips replaced by the same reproducible-hash discipline as
    * rel_sample_hash. MIS vertices and their neighborhoods leave the
    * graph; isolated vertices (no remaining neighbor) always join.
    * O(log n) rounds w.h.p.; per round one equi-join + one partial
    * min-agg + the removal anti-joins — the textbook distributed MIS.
    *
    * @return (mis, rounds): the MIS vertex ids and the rounds used
    *         (callers with an unrolled oracle `require` rounds ≤
    *         unroll). */
  def misLuby(nodes: DataFrame, ue: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    // empty node set: the MIS of the empty graph is empty in 0 rounds —
    // short-circuit here because max(id) aggregates to NULL below and
    // the loop-carried `mis` would stay null
    if (nodes.isEmpty) return (nodes.select(col("id")), 0)
    // the priority h·2^21 + id is UNIQUE only while ids stay below
    // 2^21 — fail loudly past that (the CountMinSketchAgg.KeyBound
    // convention) instead of letting colliding priorities stall rounds
    val maxId = nodes.agg(max(col("id"))).head().getLong(0)
    require(maxId < (1L << 21),
      s"Luby MIS priority domain: max vertex id $maxId >= 2^21 — widen the " +
        "priority encoding before ids this large")
    def pri(r: Int): Column =
      (col("id") * 2654435761L + lit(r.toLong * 40503L)) % 4294967296L * 2097152L + col("id")
    var rem = nodes.select(col("id")).transform(GenSnap.snap)
    // an already-staged substrate (the session leaf view) skips the
    // initial 2.6 M-row checkpoint write; an ad-hoc caller frame still
    // snaps so the round chain starts from a materialized leaf
    var edges =
      if (ue.storageLevel != org.apache.spark.storage.StorageLevel.NONE ||
        stagedView(ue.queryExecution.analyzed)) ue
      else ue.transform(GenSnap.snap)
    var mis: DataFrame = null
    var rounds = 0
    var live = rem.count() > 0
    while (live) {
      rounds += 1
      require(rounds <= maxRounds,
        s"Luby MIS still live past $maxRounds rounds — raise the bound")
      val p = rem.select(col("id"), pri(rounds).as("p"))
      val nmin = edges
        .join(p.select(col("id").as("src"), col("p")), "src")
        .groupBy(col("dst").as("id")).agg(min("p").as("np"))
      val m = p.join(nmin, Seq("id"), "left")
        .filter(col("np").isNull || col("p") < col("np"))
        .select("id")
        .transform(GenSnap.snap)
      mis = if (mis == null) m else mis.union(m)
      val rm = m.union(
          edges.join(m.select(col("id").as("src")), "src")
            .select(col("dst").as("id")))
        .distinct()
        .transform(GenSnap.snap)
      rem = rem.join(rm, Seq("id"), "left_anti").transform(GenSnap.snap)
      edges = edges
        .join(rm.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(rm.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst")
      // r18: the per-round edges CHECKPOINT dropped — writing the
      // (shrinking, but round-1 2.6 M-row) edge set to the block store
      // every round was the query's top-3 stages (~25 s execRun at
      // sf0.1). The surviving-edge set is now a lazy chain of
      // r anti-join filters over the HOT substrate leaf: each round's
      // three reads re-probe the chain (broadcast-hash probes over a
      // columnar scan — ~0.2 s CPU each) instead of paying a
      // multi-second materialization. The removal sets (rm) stay
      // snapped, so the chain's build side is always a materialized
      // leaf and plan depth grows only linearly in the O(log n) rounds.
      live = rem.count() > 0
    }
    graft.tools.BoundProbe.record("mis_luby", rounds, maxRounds)
    (mis, rounds)
  }

  def minDist(ue: DataFrame, src: Long): (DataFrame, Int) = {
    val spark = ue.sparkSession
    import spark.implicits._
    // FRONTIER relaxation (the Bellman-Ford queue optimization): only
    // vertices whose distance improved last round propagate this round —
    // correct because every shortest path is a chain of improvements —
    // so late rounds join a shrinking frontier against the edges instead
    // of the whole distance map (measured 8.1 s → ~3 s at sf0.1). One
    // count job per round materializes the lazily-checkpointed
    // improvement set; the merged distance map is also lazily
    // checkpointed and materializes inside the next round's join, so
    // plan depth stays O(1) and no generation outlives its use.
    var dist = Seq((src, 0L)).toDF("id", "d").localCheckpoint()
    var frontier = dist
    var frontierRows = 1L
    var distRowsUB = 1L // monotone upper bound: grows by ≤ frontierRows/round
    var rounds = 0
    var live = true
    // broadcast guards: neither the frontier nor the distance map is
    // bounded small by the algorithm — past these row counts fall back
    // to shuffle joins (the correct 100 TB shape; the hints are a local
    // latency win, not a correctness requirement). With both guards
    // open, a round runs ONE shuffle (the candidate min-reduce).
    val BcastMax = 1000000L
    def bcastIf(rows: Long, df: DataFrame): DataFrame =
      if (rows <= BcastMax) broadcast(df) else df
    // noAqe wrap REVERTED (r18): the interrupted session wrapped this
    // loop unbenched; the full bench measured it 3.37 -> 4.64 s (0.73x).
    // Without AQE the per-round exchanges stay at 32 partitions and the
    // coalesced-to-few task shape AQE gives these tiny frontier
    // aggregations is worth more than the per-exchange job-wave it costs.
    while (live) {
      rounds += 1
      val cand = ue
        .join(bcastIf(frontierRows,
          frontier.select(col("id").as("src"), col("d").as("sd"))), "src")
        .select(col("dst").as("id"), (col("sd") + col("w")).as("d"))
        .groupBy("id").agg(min(col("d")).as("d"))
      val imp = cand
        .join(bcastIf(distRowsUB,
          dist.select(col("id").as("id2"), col("d").as("old"))),
          col("id") === col("id2"), "left")
        .filter(col("old").isNull || col("d") < col("old"))
        .select(col("id"), col("d"))
        .transform(GenSnap.snap)
      frontierRows = imp.count()
      if (sys.env.contains("MINDIST_DEBUG"))
        System.err.println(s"[minDist] round=$rounds frontier=$frontierRows")
      if (frontierRows == 0) live = false
      else {
        distRowsUB += frontierRows
        frontier = imp
        // merge = improvements ∪ (unimproved distances): the anti join
        // broadcasts the improvement set (guarded), so the merge adds no
        // shuffle — vs a full-outer join, which cannot broadcast-build
        dist = imp.union(
            dist.join(bcastIf(frontierRows, imp.select(col("id"))),
              Seq("id"), "left_anti"))
          .transform(GenSnap.snap)
      }
    }
    (dist, rounds)
  }

  /** Borůvka's minimum-spanning-forest, the parallel-native MST (each
    * round EVERY component picks its lightest outgoing edge — all picks
    * in one dataflow, components at least halve per round, so ≤ ⌈log₂ n⌉
    * rounds; Kruskal/Prim are inherently sequential and never scale out).
    * Ties are impossible by construction: edges rank by the total order
    * (w, lo, hi), which is unique per canonical edge, so the forest — and
    * therefore the oracle's replay — is deterministic regardless of data
    * ties in w. Per round: ONE edge×labels equi-join + ONE per-component
    * lexicographic argmin (min over a struct), then contraction of the
    * picked component-graph via [[minLabel]] — a graph whose size is the
    * CURRENT component count, not the vertex count, so the fixpoint
    * shrinks geometrically. Everything is hash-partitioned equi-joins;
    * nothing driver-side but the round counter.
    *
    * @param ue weighted undirected edges (src, dst, w) — both directions.
    * @param uniquePairs caller asserts ue has EXACTLY ONE row per
    *        directed (src, dst) pair with w already the pair minimum —
    *        true for the session substrate, whose build IS a
    *        groupBy(pair).min aggregation (PropertyGraph.masterEdges).
    *        Skips round 1's canonicalizing re-aggregation, which the
    *        r18 probe measured at ~13 s summed executor CPU (the
    *        query's top-2 stages) re-deriving what the leaf already
    *        holds. The filter to src < dst alone then yields the same
    *        one-row-per-pair frame (min over a singleton group), so the
    *        forest is bit-identical.
    * @return ((round, lo, hi, w) — the forest edges, tagged with the
    *         round that picked them; rounds run). */
  def boruvkaMst(ue: DataFrame, uniquePairs: Boolean = false): (DataFrame, Int) = {
    // Contracted representation: one canonical row per CURRENT component
    // pair, carrying the lightest original edge (w, lo, hi) between them
    // — the textbook Borůvka contraction. The work set shrinks
    // geometrically (components at least halve AND parallel multi-edges
    // collapse to their pair-minimum, which preserves every possible
    // argmin winner), so only round 1 ever touches the full edge list —
    // unlike a vertex-labels formulation that rescans |E| every round.
    //
    // ARGMIN ENCODING (r17 optimization round, guide §1.2 step 2): the
    // lexicographic (w, lo, hi) argmins used to run as min(struct(...)),
    // which Spark can only plan as a SortAggregate — the probe showed
    // the per-round sorts burning ~17 s summed executor CPU at sf0.1
    // (the top-4 stages of the query). Packing the total order into ONE
    // BIGINT pk = (w << 42) | (lo << 21) | hi makes every argmin a
    // plain HashAggregate min; the pick's `other` endpoint rides a
    // min_by over the same key, which is deterministic because an
    // original edge (lo, hi) connects exactly one component pair, so pk
    // is unique within a component's candidate list. Decoding is exact
    // integer shift/mask arithmetic — the forest is bit-identical and
    // the oracle is untouched. The domain requires are LOUD bounds, not
    // silent truncation: both fail before any wrong answer is possible.
    val lim = 1L << 21
    val dom = ue.agg(max(greatest(col("src"), col("dst"))).as("mi"),
      max(col("w")).as("mw")).head()
    if (!dom.isNullAt(0)) { // empty graph: nothing to encode
      require(dom.getLong(0) < lim,
        s"Borůvka pack domain: max vertex id ${dom.getLong(0)} >= 2^21 — " +
          "widen the (w, lo, hi) encoding before ids this large")
      require(dom.getLong(1) < lim,
        s"Borůvka pack domain: max weight ${dom.getLong(1)} >= 2^21 — " +
          "widen the (w, lo, hi) encoding before weights this large")
    }
    def pack(w: Column, lo: Column, hi: Column): Column =
      w * lit(1L << 42) + lo * lit(1L << 21) + hi
    // exact shift/mask decode — never float division, which rounds
    // above 2^53
    val unpackW = shiftright(col("pk"), 42)
    val unpackLo = shiftright(col("pk"), 21).bitwiseAND(lit(lim - 1))
    val unpackHi = col("pk").bitwiseAND(lit(lim - 1))
    // initial canonical pairs: lo = a and hi = b are CONSTANT within a
    // (src, dst) group, so the former min(struct(w, lo, hi)) is just
    // min(w) — hash-aggregable directly, no pack needed
    var edges = {
      val half = ue.filter(col("src") < col("dst"))
      val canon =
        if (uniquePairs) half.select(col("src").as("a"), col("dst").as("b"), col("w"))
        else half
          .groupBy(col("src").as("a"), col("dst").as("b"))
          .agg(min(col("w")).as("w"))
      canon.select(col("a"), col("b"), col("w"), col("a").as("lo"),
        col("b").as("hi"))
    }.transform(GenSnap.snap)
    var mst: DataFrame = null
    var rounds = 0
    var live = true
    while (live) {
      val cand = edges
        .select(col("a").as("c"), pack(col("w"), col("lo"), col("hi")).as("pk"),
          col("b").as("other"))
        .union(edges.select(col("b").as("c"),
          pack(col("w"), col("lo"), col("hi")).as("pk"), col("a").as("other")))
      val pick = cand.groupBy("c")
        .agg(min("pk").as("pk"), min_by(col("other"), col("pk")).as("other"))
        .select(col("c"), unpackW.as("w"), unpackLo.as("lo"),
          unpackHi.as("hi"), col("other"))
        .transform(GenSnap.snap)
      val nPick = pick.count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[boruvka] round=${rounds + 1} picks=$nPick")
      if (nPick == 0) live = false
      else {
        rounds += 1
        val chosen = pick
          .select(col("lo"), col("hi"), col("w"))
          .distinct()
          .select(lit(rounds).as("round"), col("lo"), col("hi"), col("w"))
          .transform(GenSnap.snap)
        mst = if (mst == null) chosen else mst.union(chosen)
        // contract: the picks form a PSEUDO-FOREST — under the (w,lo,hi)
        // total order every cycle in the functional graph c → other is a
        // mutual-pick 2-cycle — so contraction needs no general CC
        // fixpoint: root each tree at its 2-cycle's smaller endpoint,
        // then POINTER-JUMP (p := p∘p) to the root in ⌈log₂ depth⌉
        // driver-synced jumps over the component-count-sized parent
        // table, instead of [[minLabel]]'s one-hop-per-iteration
        // diameter walk (VERDICT r11 task 4: 30 inner iterations → ~8
        // jumps at sf0.1). The representative choice differs from
        // minLabel's component-minimum, but the forest output is
        // label-invariant: picks and pair-minima depend only on the
        // component PARTITION, never on which id names it.
        // Generation snapshot for the jump loop: a bare localCheckpoint
        // would carry originStats forward, and a SELF-join SQUARES
        // sizeInBytes every generation — by round 4 the stats visitor
        // is multiplying million-digit BigInts and the driver burns
        // ~40 s in SizeInBytesOnlyStatsPlanVisitor (measured; jstack'd
        // round 12). [[GenSnap.snap]] is that finding generalized: it
        // caps the carried estimate so the product can never compound,
        // without the round-12 createDataFrame re-wrap's
        // InternalRow→Row→InternalRow round-trip.
        def snap(df: DataFrame): DataFrame = GenSnap.snap(df)
        val pk = pick.select(col("c"), col("other").as("o"))
        var par = snap(pk
          .join(pk.select(col("c").as("oc"), col("o").as("oo")),
            col("o") === col("oc"), "left")
          .select(col("c"),
            when(col("oo") === col("c") && col("c") < col("o"), col("c"))
              .otherwise(col("o")).as("p")))
        var jumping = true
        var jumps = 0
        while (jumping) {
          jumps += 1
          val j = snap(par
            .join(par.select(col("c").as("pc"), col("p").as("pp")),
              col("p") === col("pc"))
            .select(col("c"), col("pp").as("p"),
              (col("pp") =!= col("p")).as("ch")))
          jumping = j.filter(col("ch")).count() > 0
          par = j.select("c", "p")
        }
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[boruvka] contraction pointer-jumped in $jumps")
        val relab = par.select(col("c").as("id"), col("p").as("l"))
        edges = edges
          .join(relab.select(col("id").as("a"), col("l").as("la")), Seq("a"), "left")
          .join(relab.select(col("id").as("b"), col("l").as("lb")), Seq("b"), "left")
          .select(coalesce(col("la"), col("a")).as("na"),
            coalesce(col("lb"), col("b")).as("nb"),
            col("w"), col("lo"), col("hi"))
          .filter(col("na") =!= col("nb"))
          .groupBy(least(col("na"), col("nb")).as("a"),
            greatest(col("na"), col("nb")).as("b"))
          .agg(min(pack(col("w"), col("lo"), col("hi"))).as("pk"))
          .select(col("a"), col("b"), unpackW.as("w"), unpackLo.as("lo"),
            unpackHi.as("hi"))
          .transform(GenSnap.snap)
      }
    }
    val out =
      if (mst == null)
        ue.limit(0).select(lit(0).as("round"), col("src").as("lo"),
          col("dst").as("hi"), col("w"))
      else mst
    (out, rounds)
  }
}
