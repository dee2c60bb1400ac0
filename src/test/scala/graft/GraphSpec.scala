package graft

import graft.graph.PropertyGraph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("supplier-part graph has one node per supplier and part") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val nSup = Tables.supplier(spark, sf).count()
    val nPart = Tables.part(spark, sf).count()
    assert(g.nodes.count() === nSup + nPart)
    assert(g.nodesByLabel("Supplier").count() === nSup)
    assert(g.nodesByLabel("Part").count() === nPart)
  }

  test("expand resolves edge endpoints to labeled nodes") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val ex = g.expand("SUPPLIES")
    assert(ex.count() === g.edges.count())
    assert(ex.filter(col("src_label") =!= "Supplier" || col("dst_label") =!= "Part")
      .count() === 0)
  }

  test("connected components labels are component minima and cover all nodes") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val cc = g.toGraphX.connectedComponents().vertices.collect().toMap
    assert(cc.size === g.nodes.count())
    // every component label is itself a member of the component
    val labels = cc.values.toSet
    assert(labels.forall(l => cc(l) == l))
    // component label is the minimum id in the component
    cc.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min === label)
    }
  }

  test("shortest paths (undirected): landmarks at 0, their parts at 1, bipartite parity") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val out = SparkEntry.queries("graph_shortest_paths")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L)._1 === 0)
    assert(out(2L)._2 === 0)
    // parts supplied by landmark 1 are exactly one hop away
    val direct = g.edges.filter(col("src") === 1L)
      .select("dst").collect().map(_.getLong(0)).toSet
    assert(direct.nonEmpty)
    direct.foreach(p => assert(out(p)._1 === 1, s"part $p supplied by s1"))
    // bipartite invariant: suppliers sit at even distances, parts at odd
    out.foreach { case (id, (d1, _)) =>
      if (d1 >= 0)
        assert((id < PropertyGraph.PartIdOffset) === (d1 % 2 === 0),
          s"vertex $id at distance $d1 violates bipartite parity")
    }
    // the oracle's recursion is bounded at SpMaxDepth and quietly reports
    // -1 beyond it; surface any eccentricity creep loudly here instead
    val deepest = out.values.flatMap(d => Seq(d._1, d._2)).filter(_ >= 0).max
    assert(deepest <= 12,
      s"deepest finite BFS distance $deepest is no longer well below the " +
        "SpMaxDepth=24 oracle bound — raise both before this diverges")
  }

  test("weighted SSSP agrees with BFS on reachability and hop bounds") {
    val bfs = SparkEntry.queries("graph_shortest_paths")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val wd = SparkEntry.queries("graph_weighted_sssp")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bfs.keySet === wd.keySet)
    assert(wd(1L) === 0L, "the source sits at distance 0")
    for ((id, h) <- bfs) {
      if (h < 0) assert(wd(id) === -1L, s"$id: reachability must match BFS")
      else {
        assert(wd(id) >= h, s"$id: every hop costs ≥ 1, so wdist ≥ hops")
        assert(wd(id) <= h * 50L, s"$id: the BFS path itself costs ≤ hops × 50")
      }
    }
  }

  test("GraphX views ship unit vertex attributes, not property Rows") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    // the algorithms need only the vertex id; anything heavier multiplies
    // Pregel vertex-replication traffic by the attribute width
    assert(g.toGraphX.vertices.first()._2 === (()))
    assert(g.toGraphXUndirected.vertices.first()._2 === (()))
  }

  test("static PageRank mass is conserved approximately") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val pr = g.toGraphX.staticPageRank(10).vertices.map(_._2).sum()
    val n = g.toGraphX.numVertices
    assert(math.abs(pr / n - 1.0) < 0.2, s"mean rank ${pr / n} should be ~1")
  }

  test("convergence-mode LPA: fixpoint, shrinking change trace, 4-step refines it") {
    import spark.implicits._
    // two triangles bridged at 3-4, plus an isolated vertex — the graph
    // where hand-running the semi-synchronous schedule (default id-parity
    // coloring: evens then odds) is tractable. Expected trace: supersteps
    // change 5, 3, 1 then 0 labels; label 1 floods both triangles across
    // the bridge (smallest-label ties are aggressive — legitimate LPA
    // coarsening); the isolated vertex keeps its own label.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("id")
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val ue = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val run = graph.Components.lpaConverged(nodes, ue, maxIters = 30)
    assert(run.converged, s"must reach a zero-change superstep: ${run.changeCounts}")
    assert(run.changeCounts === Seq(5L, 3L, 1L, 0L),
      "the change trace must shrink monotonically to the fixpoint")
    val got = run.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 9L -> 9L))
    // partition relation to the fixed-depth oracle form: more supersteps
    // only COARSEN, so every 4-step community sits inside one converged
    // community (the 4-step labels refine the converged labels)
    val l4 = graph.Components.lpa(nodes, ue, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    l4.groupBy(_._2).foreach { case (lbl4, members) =>
      assert(members.keys.map(got).toSet.size === 1,
        s"4-step community $lbl4 straddles converged communities")
    }
  }

  test("graph_lpa_converged labels every vertex and respects components") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val out = SparkEntry.queries("graph_lpa_converged")(spark, sf)
    assert(out.count() === g.nodes.count(), "one label per vertex")
    // labels spread only along edges: no community may straddle two
    // connected components (same invariant as the fixed-depth form)
    val e = g.edges.select(col("src"), col("dst"))
    val ue = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val cc = graph.Components.minLabel(ue).withColumnRenamed("l", "component")
    val straddling = out.join(cc, "id")
      .groupBy("community").agg(countDistinct(col("component")).as("ncomp"))
      .filter(col("ncomp") > 1).count()
    assert(straddling === 0L)
  }

  test("every LPA community lies inside one connected component") {
    // cross-query invariant: labels propagate only along edges, so an
    // LPA community can never straddle two components of the same graph
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val e = g.edges.select(col("src"), col("dst"))
    val ue = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val lpa = SparkEntry.queries("graph_label_propagation")(spark, sf)
    val cc = graph.Components.minLabel(ue)
      .withColumnRenamed("l", "component")
    val straddling = lpa.join(cc, "id")
      .groupBy("community")
      .agg(countDistinct(col("component")).as("ncomp"))
      .filter(col("ncomp") > 1)
      .count()
    assert(straddling === 0L,
      "no LPA community may span multiple connected components")
    // and communities refine components: at least as many communities
    val nComm = lpa.select("community").distinct().count()
    val nComp = cc.select("component").distinct().count()
    assert(nComm >= nComp)
  }

  test("shortest-path counting: diamond graph has two paths across") {
    import spark.implicits._
    // 1-2, 1-3, 2-4, 3-4: two shortest 1→4 paths of length 2
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val ue = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val got = graph.Components.multiBfsCounts(ue, Seq(1L), 8)
      .collect().map(r => r.getLong(1) -> (r.getInt(2), r.getLong(3))).toMap
    assert(got === Map(1L -> (0, 1L), 2L -> (1, 1L), 3L -> (1, 1L), 4L -> (2, 2L)))
  }

  test("temporal reachability excludes paths that travel back in time") {
    // 1-2 at t=10, 2-3 at t=5: plain BFS reaches 3, but after arriving
    // at 2 at time 10 the t=5 edge is in the past — time-respecting
    // reachability must exclude 3. The sf query's kernel is inline in
    // PropertyGraph, so drive the same semantics through the driver
    // query on real data plus this structural assertion on the shape:
    // arrival times along any realized path must be non-decreasing.
    val arr = SparkEntry.queries("graph_temporal_reach")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(arr(1L) === 0L, "the seed arrives at time 0")
    // arrival of any reached node is witnessed by an edge from another
    // reached node with t >= that node's arrival and t == arrival(w)
    val et = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey").as("a"),
        (col("l_partkey") + 1000000L).as("b"))
      .agg(min(expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS LONG) DIV 86400")).as("t"))
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1), r.getLong(2)),
          (r.getLong(1), r.getLong(0), r.getLong(2))))
    val byDst = et.groupBy(_._2)
    arr.filter(_._2 > 0L).foreach { case (w, aw) =>
      val ok = byDst.getOrElse(w, Array.empty).exists { case (v, _, t) =>
        arr.get(v).exists(av => t >= av && t == aw)
      }
      assert(ok, s"node $w arrival $aw has no witnessing time-respecting edge")
    }
  }

  test("Luby MIS is independent and maximal on the supplier-part graph") {
    val mis = SparkEntry.queries("graph_mis_luby")(spark, sf)
      .select(col("id")).localCheckpoint(false)
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val e = g.edges.select(col("src"), col("dst"))
    val ue = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // independence: no edge has both endpoints in the MIS
    val internal = ue
      .join(mis.select(col("id").as("src")), "src")
      .join(mis.select(col("id").as("dst")), "dst")
      .count()
    assert(internal === 0L, s"$internal edges inside the MIS")
    // maximality: every non-member has at least one MIS neighbor
    val uncovered = g.nodes.select(col("id"))
      .join(mis, Seq("id"), "left_anti")
      .join(ue.join(mis.select(col("id").as("dst")), "dst")
          .select(col("src").as("id")).distinct(),
        Seq("id"), "left_anti")
      .count()
    assert(uncovered === 0L, s"$uncovered non-members have no MIS neighbor")
  }

  test("betweenness: diamond and path graphs match hand-computed Brandes") {
    import spark.implicits._
    // diamond 1-2,1-3,2-4,3-4, source 1: σ4=2 via both middles, so
    // δ(2)=δ(3)=(1/2)(1+0)=0.5, δ(4)=0
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val ue = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val got = graph.Components.betweenness(ue, Seq(1L), 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(2L -> 0.5, 3L -> 0.5, 4L -> 0.0))
    // path 1-2-3-4, sources {1,4}: from 1, δ(3)=1 and δ(2)=1+δ(3)=2;
    // from 4 symmetric — middles total 3, endpoints relay nothing (0)
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val pu = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    val got2 = graph.Components.betweenness(pu, Seq(1L, 4L), 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2 === Map(1L -> 0.0, 2L -> 3.0, 3L -> 3.0, 4L -> 0.0))
  }

  test("sampled betweenness: seeds = V recovers exact Brandes; the n/s scaling is exact") {
    import spark.implicits._
    // P5 path 1-2-3-4-5, ALL 5 sources: B(v) = # ordered (s,t) pairs
    // routed through v: B(3) = |{1,2}×{4,5}|·2 = 8, B(2) = B(4) = 6,
    // endpoints relay nothing. With seeds = V the estimator's n/s
    // factor is 1, so B̂ must EQUAL exact Brandes bit-for-bit.
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val pu = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    val full = graph.Components.betweenness(pu, Seq(1L, 2L, 3L, 4L, 5L), 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full === Map(1L -> 0.0, 2L -> 6.0, 3L -> 8.0, 4L -> 6.0, 5L -> 0.0))
    // single-pivot estimate from source 1: δ₁ = (2→3, 3→2, 4→1, 5→0),
    // scaled by n/s = 5 — the Brandes–Pich arithmetic, pinned exactly
    val est = graph.Components.betweenness(pu, Seq(1L), 8)
      .select(col("id"), (lit(5.0 / 1) * col("bc")).as("bc_est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(est === Map(2L -> 15.0, 3L -> 10.0, 4L -> 5.0, 5L -> 0.0))
  }

  test("closeness centrality: path graph closeness matches hand computation") {
    import spark.implicits._
    // 1-2-3-4 path; from seed 1: dists 1,2,3 → reached 3, sum 6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val ue = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val dist = graph.Components.multiBfs(ue, Seq(1L), 8)
      .filter(col("d") > 0)
    val agg = dist.agg(count(lit(1)), sum(col("d").cast("long")),
      sum(expr("1000000000 DIV d"))).head()
    assert(agg.getLong(0) === 3L)
    assert(agg.getLong(1) === 6L)
    assert(agg.getLong(2) === 1000000000L + 500000000L + 333333333L)
  }

  test("SCC coloring: hand-built 2-cycle + bridge + tail graph") {
    import spark.implicits._
    // two 3-cycles {1,2,3} and {10,11,12}, a bridge 3→10, a tail 12→20:
    // SCC labels must be the component minima 1, 10, and singleton 20.
    val de = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L), (12L, 20L)).toDF("src", "dst")
    val nodes = de.select(col("src").as("id"))
      .union(de.select(col("dst").as("id"))).distinct()
    val (scc, rounds) = graph.Components.sccColoring(nodes, de, 8)
    val got = scc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
    assert(rounds <= 3, s"peel took $rounds rounds on a 2-level DAG of SCCs")
    // the FIRST round must already peel the root SCC {1,2,3} (1 is the
    // global min id, so it is always a round-1 root) AND {10,11,12}
    // stays for a later round only if 1 colors it — it does (3→10), so
    // the peel order exercises the multi-round path, not just round 1.
    assert(rounds >= 2)
  }

  test("SCC condensation is acyclic and feeds the reachability kernels") {
    import spark.implicits._
    val de = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L), (12L, 20L)).toDF("src", "dst")
    val nodes = de.select(col("src").as("id"))
      .union(de.select(col("dst").as("id"))).distinct()
    val (scc, _) = graph.Components.sccColoring(nodes, de, 8)
    val cond = de
      .join(scc.select(col("id").as("src"), col("scc").as("cs")), "src")
      .join(scc.select(col("id").as("dst"), col("scc").as("cd")), "dst")
      .filter(col("cs") =!= col("cd"))
      .select(col("cs").as("src"), col("cd").as("dst")).distinct()
      .cache()
    assert(cond.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (10L, 20L)))
    // acyclicity: SCC of the condensation itself must be all singletons
    val cn = cond.select(col("src").as("id"))
      .union(cond.select(col("dst").as("id"))).distinct()
    val (cScc, _) = graph.Components.sccColoring(cn, cond, 8)
    assert(cScc.filter(col("id") =!= col("scc")).count() === 0L,
      "condensation DAG contains a non-trivial SCC — contraction is broken")
    // and it drives the existing reachability kernel directly: BFS from
    // the root component reaches the whole condensation chain
    val reach = graph.Components.multiBfs(cond, Seq(1L), 8)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(reach === Map(1L -> 0, 10L -> 1, 20L -> 2))
  }

  test("SCC on the sf0.001 chain graph matches a driver-side Tarjan replay") {
    val de = PropertyGraph.partChainEdges(spark, sf)
    val edges = de.collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // iterative Tarjan over the collected edge list (test-only ground
    // truth — the distributed kernel must agree on every label, where a
    // label is the component's min id)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var counter = 0
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStk = scala.collection.mutable.Set.empty[Long]
    val stk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val label = scala.collection.mutable.Map.empty[Long, Long]
    for (v0 <- nodes if !index.contains(v0)) {
      val work = scala.collection.mutable.Stack((v0, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.top
        if (pi == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stk += v; onStk += v
        }
        val succs = adj.getOrElse(v, Array.empty[Long])
        var i = pi
        var recursed = false
        while (i < succs.length && !recursed) {
          val w = succs(i)
          if (!index.contains(w)) {
            work.pop(); work.push((v, i + 1)); work.push((w, 0)); recursed = true
          } else {
            if (onStk(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!recursed) {
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = -1L
            while (w != v) { w = stk.remove(stk.length - 1); onStk -= w; comp += w }
            val m = comp.min
            comp.foreach(label(_) = m)
          }
          work.pop()
          if (work.nonEmpty) {
            val (u, _) = work.top
            low(u) = math.min(low(u), low(v))
          }
        }
      }
    }
    val got = SparkEntry.queries("graph_scc")(spark, sf)
    val sizes = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = label.groupBy(_._2).map { case (l, m) => l -> m.size.toLong }
    assert(sizes === want, "distributed SCC diverges from Tarjan ground truth")
    assert(sizes.values.sum === nodes.length.toLong)
  }
}
