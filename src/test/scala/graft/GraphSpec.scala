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

  test("shortest paths: landmark suppliers are at distance 0 from themselves") {
    val out = SparkEntry.queries("graph_shortest_paths")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L)._1 === 0)
    assert(out(2L)._2 === 0)
    // ShortestPaths follows edge direction; in the supplier→part graph
    // parts are unreachable FROM other vertices' perspective toward
    // suppliers only via the landmark-propagation convention: parts
    // supplied by landmark 1 see distance... assert instead the global
    // invariant: every recorded distance is -1 (unreachable) or >= 0
    assert(out.values.forall { case (a, b) => a >= -1 && b >= -1 })
  }

  test("static PageRank mass is conserved approximately") {
    val g = PropertyGraph.supplierPartGraph(spark, sf)
    val pr = g.toGraphX.staticPageRank(10).vertices.map(_._2).sum()
    val n = g.toGraphX.numVertices
    assert(math.abs(pr / n - 1.0) < 0.2, s"mean rank ${pr / n} should be ~1")
  }
}
