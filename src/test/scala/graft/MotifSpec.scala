package graft

import graft.graph.{Motif, PropertyGraph}
import org.apache.spark.sql.functions._

/** The declarative pattern front-end (VERDICT r11 task 1): parser
  * semantics, both compilation targets, and equivalence of compiled
  * patterns with the hand-written catalog kernels they replace. */
class MotifSpec extends SparkSpec {

  private def g = PropertyGraph.supplierPartGraph(spark, sf)

  // ── parser ──────────────────────────────────────────────────────────

  test("edge direction resolves at parse time, both arrow forms") {
    val p = Motif.parse("(a)-[:T]->(b), (c)<-[:U]-(d), (e)-->(f), (h)<--(i)")
    assert(p.edges == Seq(
      Motif.EdgePat("a", None, Some("T"), "b"),
      Motif.EdgePat("d", None, Some("U"), "c"),
      Motif.EdgePat("e", None, None, "f"),
      Motif.EdgePat("i", None, None, "h")))
  }

  test("chained paths share interior variables") {
    val p = Motif.parse("MATCH (a)-[:T]->(b)-[:U]->(c)")
    assert(p.edges == Seq(
      Motif.EdgePat("a", None, Some("T"), "b"),
      Motif.EdgePat("b", None, Some("U"), "c")))
    // default RETURN = every node var's id, first-appearance order
    assert(p.items.map(_.alias) == Seq("a", "b", "c"))
  }

  test("property maps desugar to equality predicates") {
    val p = Motif.parse("(a:Part {id: 42, name: 'x'})-[:T]->(b)")
    assert(p.nodeLabels("a").contains("Part"))
    assert(p.preds.toSet == Set(
      Motif.Pred(Motif.PropRef("a", "id"), "=", Motif.LitLong(42)),
      Motif.Pred(Motif.PropRef("a", "name"), "=", Motif.LitStr("x"))))
  }

  test("malformed patterns fail loudly with positions") {
    def bad(s: String): String =
      intercept[IllegalArgumentException](Motif.parse(s)).getMessage
    assert(bad("(a)-[:T]->(b) RETURN q.id").contains("unbound variable 'q'"))
    assert(bad("(a)-[:T]->(b) RETURN a.id ORDER BY nope").contains("ORDER BY"))
    assert(bad("(a)-[:T]->(b) RETURN a.id AS x, b.id AS x").contains("duplicate"))
    assert(bad("(a)-[:T]->(b) RETURN a.price").contains("no property"))
    assert(bad("(a)-[e:T]->(b) RETURN e.id").contains("no property"))
    assert(bad("(a:L1)-[:T]->(b), (a:L2)-->(c)").contains("two labels"))
    assert(bad("(a)-[:T]->(b) garbage").contains("trailing"))
    assert(bad("(a:Part {id: 'unterminated)").contains("unterminated"))
  }

  // ── compiled DataFrames ≡ hand-written kernels ──────────────────────

  test("pattern two-hop ≡ the hand-written graph_two_hop kernel") {
    val pat = g.find(
      "MATCH (p1)<-[:SUPPLIES]-(s)-[:SUPPLIES]->(p2) " +
        "WHERE p1.id = 1000001 AND p2.id <> 1000001 " +
        "RETURN DISTINCT p2.id AS part ORDER BY part")
      .collect().map(_.getLong(0) - PropertyGraph.PartIdOffset).toSeq
    val hand = SparkEntry.queries("graph_two_hop")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(pat == hand)
  }

  test("pattern aggregate ≡ the hand-written graph_out_degree kernel") {
    val pat = g.find(
      "MATCH (s)-[:SUPPLIES]->(p) RETURN s.id AS src, count(p) AS degree ORDER BY src")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val hand = SparkEntry.queries("graph_out_degree")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pat == hand)
  }

  test("edge variables expose weight; sum(e.weight) = degree on unit weights") {
    val rows = g.find(
      "MATCH (s)-[e:SUPPLIES]->(p) RETURN s.id AS src, count(p) AS d, " +
        "sum(e.weight) AS w ORDER BY src LIMIT 7")
      .collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getDouble(2) == r.getLong(1).toDouble))
  }

  test("label predicates join the nodes table and filter") {
    val sup = g.find("(s:Supplier)-[:SUPPLIES]->(p) RETURN DISTINCT s.id AS id")
    val all = g.find("(s)-[:SUPPLIES]->(p) RETURN DISTINCT s.id AS id")
    // every edge source IS a supplier, so the label join must not drop rows
    assert(sup.count() == all.count())
    // but an impossible label yields nothing (EdgeCaseSpec pins the
    // unsatisfiable-pattern case too)
    assert(g.find("(s)-[:SUPPLIES]->(p:Supplier) RETURN p.id AS id").count() == 0)
  }

  test("var-to-var predicates and string properties work") {
    val rows = g.find(
      "MATCH (a)-[:SUPPLIES]->(p), (b)-[:SUPPLIES]->(p) " +
        "WHERE a.id < b.id AND p.id = 1000001 " +
        "RETURN a.id AS a, b.id AS b ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b) => assert(a < b) }
    val named = g.find(
      "MATCH (s:Supplier)-[:SUPPLIES]->(p) WHERE s.name = 'Supplier#000000001' " +
        "RETURN DISTINCT s.id AS id, s.name AS name")
      .collect()
    assert(named.nonEmpty)
    assert(named.forall(_.getString(1) == "Supplier#000000001"))
  }

  test("disconnected patterns produce the cross product") {
    val n = g.find(
      "MATCH (a:Part {id: 1000001}), (s:Supplier) RETURN a.id AS a, s.id AS s")
      .count()
    val nSup = Tables.supplier(spark, sf).count()
    assert(n == nSup)
  }

  test("self-loop pattern is satisfiable syntax, empty on a bipartite graph") {
    assert(g.find("(a)-[:SUPPLIES]->(a) RETURN a.id AS id").count() == 0)
  }

  test("LIMIT and DESC ordering apply") {
    val rows = g.find(
      "(s)-[:SUPPLIES]->(p) RETURN s.id AS src, count(p) AS d " +
        "ORDER BY d DESC, src ASC LIMIT 3").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).toSeq.sorted.reverse == rows.map(_.getLong(1)).toSeq)
  }

  test("variable-length patterns parse and count one row per path") {
    val p = Motif.parse("(a)-[:T*2..3]->(b) RETURN a.id AS a, b.id AS b")
    assert(p.edges == Seq(Motif.EdgePat("a", None, Some("T"), "b", 2, 3)))
    assert(Motif.parse("(a)-[:T*2]->(b)").edges.head.maxHops == 2)
    assert(Motif.parse("(a)-[:T*..3]->(b)").edges.head ==
      Motif.EdgePat("a", None, Some("T"), "b", 1, 3))
    def bad(s: String): String =
      intercept[IllegalArgumentException](Motif.parse(s)).getMessage
    assert(bad("(a)-[:T*]->(b)").contains("explicit hop bounds"))
    assert(bad("(a)-[:T*0..2]->(b)").contains("out of"))
    assert(bad("(a)-[:T*2..99]->(b)").contains("out of"))
    assert(bad("(a)-[e:T*2]->(b)").contains("cannot bind"))
    assert(bad("(a)-[:T*2]->(a)").contains("self-loop"))
    // semantics on a hand-built diamond: 1→{2,3}→4→5; 2-hop paths 1→4
    // have multiplicity 2 (per-PATH rows), 1..2 unions both depths
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val es = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("T").as("rel_type"), lit(1.0).as("weight"))
    val ns = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
      .select(col("id"), lit("N").as("label"), col("id").cast("string").as("name"))
    val dg = PropertyGraph(ns, es)
    val twoHop = dg.find("(a)-[:T*2]->(b) RETURN a.id AS a, b.id AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(twoHop == Seq((1L, 4L), (1L, 4L), (2L, 5L), (3L, 5L)))
    val upTo2 = dg.find(
      "(a)-[:T*1..2]->(b) RETURN a.id AS a, b.id AS b, count(*) AS paths " +
        "ORDER BY a, b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(upTo2.contains((1L, 4L, 2L))) // two distinct 2-hop paths
    assert(upTo2.contains((1L, 2L, 1L)))
    // generated SQL unrolls the same chains
    val sql = Motif.sql(Motif.parse("(a)-[:T*2..3]->(b) RETURN a.id AS a"))
    assert(sql.contains("UNION ALL") && sql.contains("JOIN edges h2") &&
      sql.contains("h3"), sql)
  }

  // ── the generated-SQL target ────────────────────────────────────────

  test("Motif.sql emits the same joins the DataFrame target plans") {
    val ast = Motif.parse(
      "MATCH (s:Supplier)-[:SUPPLIES]->(p:Part {id: 1000001}) " +
        "RETURN s.id AS supplier, s.name AS supplier_name ORDER BY supplier")
    val sql = Motif.sql(ast)
    assert(sql.contains("FROM edges e0"))
    assert(sql.contains("JOIN nodes n_s ON n_s.label = 'Supplier' AND n_s.id = e0.src"))
    assert(sql.contains("JOIN nodes n_p ON n_p.label = 'Part' AND n_p.id = e0.dst"))
    assert(sql.contains("e0.rel_type = 'SUPPLIES'"))
    assert(sql.contains("e0.dst = 1000001"))
    assert(sql.contains("ORDER BY supplier ASC"))
    // no node join for id-only vars: two-hop SQL touches only edges
    val hop = Motif.sql(Motif.parse(
      "(p1)<-[:SUPPLIES]-(s)-[:SUPPLIES]->(p2) WHERE p1.id = 1 RETURN DISTINCT p2.id AS part"))
    assert(!hop.contains("nodes"), hop)
    assert(hop.contains("e1.src = e0.src"), hop)
  }
}
