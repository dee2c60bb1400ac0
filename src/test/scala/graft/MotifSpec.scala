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

  // ── r12 additions: duplicate edge vars, OPTIONAL, NOT, writes ───────

  test("the same edge variable on two edges fails loudly (ADVICE r12)") {
    val m = intercept[IllegalArgumentException](Motif.parse(
      "(a)-[e:T]->(b), (c)-[e:T]->(d) RETURN a.id AS a")).getMessage
    assert(m.contains("bound on two edges"), m)
  }

  /** A part id some-but-not-all suppliers supply — at sf0.001 part
    * 1000001 is supplied by EVERY one of the 10 suppliers, which would
    * degenerate the optional/negation fixtures. */
  private lazy val partialPart: Long = {
    val nSup = g.nodesByLabel("Supplier").count()
    g.edges.groupBy("dst").agg(count(lit(1)).as("deg"))
      .filter(col("deg") < nSup && col("deg") > 0).orderBy("dst")
      .first().getLong(0)
  }

  test("OPTIONAL MATCH left-joins: unmatched rows keep NULLs, matched carry props") {
    val out = g.find(
      s"MATCH (s:Supplier) OPTIONAL MATCH (s)-[e:SUPPLIES]->(p:Part {id: $partialPart}) " +
        "RETURN s.id AS supplier, p.id AS part, e.weight AS w ORDER BY supplier")
      .collect()
    val all = g.nodesByLabel("Supplier").count()
    assert(out.length == all, "one row per supplier — left join, not inner")
    val matched = out.filter(!_.isNullAt(1))
    val unmatched = out.filter(_.isNullAt(1))
    assert(matched.nonEmpty && unmatched.nonEmpty, "fixture needs both cases")
    assert(matched.forall(r => r.getLong(1) == partialPart && r.getDouble(2) == 1.0))
    assert(unmatched.forall(_.isNullAt(2)))
    // ≡ the hand-written left join
    val want = g.nodesByLabel("Supplier").select(col("id"))
      .join(g.edges.filter(col("dst") === partialPart).select(col("src").as("id")),
        Seq("id"), "left_semi").count()
    assert(matched.length.toLong == want)
  }

  test("OPTIONAL MATCH validation: shared var required, scoping enforced") {
    def bad(s: String): String =
      intercept[IllegalArgumentException](Motif.parse(s)).getMessage
    assert(bad("MATCH (a)-[:T]->(b) OPTIONAL MATCH (x)-[:U]->(y) RETURN a.id AS a")
      .contains("share at least one variable"))
    // a NEW label on a main-bound var inside OPTIONAL would mis-scope
    assert(bad("MATCH (a)-[:T]->(b) OPTIONAL MATCH (a:Supplier)-[:U]->(y) RETURN a.id AS a")
      .contains("may not add a label"))
    // main WHERE cannot see optional vars (Cypher scoping)
    assert(bad("MATCH (a)-[:T]->(b) WHERE y.id = 1 OPTIONAL MATCH (a)-[:U]->(y) RETURN a.id AS a")
      .contains("cannot see 'y'"))
    // optional WHERE sees optional vars + shared ids, not main props
    assert(bad("MATCH (a:Supplier)-[:T]->(b) OPTIONAL MATCH (a)-[:U]->(y) " +
      "WHERE a.name = 'x' RETURN a.id AS a").contains("optional WHERE"))
  }

  test("NOT pattern ≡ hand-written anti-join; validation rejects bad forms") {
    val out = g.find(
      s"MATCH (s:Supplier) WHERE NOT (s)-[:SUPPLIES]->(x {id: $partialPart}) " +
        "RETURN s.id AS supplier ORDER BY supplier").collect().map(_.getLong(0))
    val want = g.nodesByLabel("Supplier").select(col("id"))
      .join(g.edges.filter(col("dst") === partialPart).select(col("src").as("id")),
        Seq("id"), "left_anti").orderBy("id").collect().map(_.getLong(0))
    assert(out.toSeq == want.toSeq && out.nonEmpty)
    def bad(s: String): String =
      intercept[IllegalArgumentException](Motif.parse(s)).getMessage
    assert(bad("MATCH (a)-[:T]->(b) WHERE NOT (x)-[:T]->(y) RETURN a.id AS a")
      .contains("at least one bound endpoint"))
    assert(bad("MATCH (a)-[:T]->(b) WHERE NOT (a:Supplier)-[:T]->(x) RETURN a.id AS a")
      .contains("re-constrain"))
    // generated SQL uses a correlated NOT EXISTS
    val sql = Motif.sql(Motif.parse(
      "MATCH (s:Supplier) WHERE NOT (s)-[:SUPPLIES]->(x {id: 7}) RETURN s.id AS s"))
    assert(sql.contains("NOT EXISTS") && sql.contains("gx0.dst = 7"), sql)
  }

  test("CREATE compiles to new-edge rows; parse() rejects writes") {
    val st = Motif.parseStatement(
      "MATCH (a:Supplier)-[:SUPPLIES]->(p:Part {id: 1000001}), " +
        "(b:Supplier)-[:SUPPLIES]->(p) WHERE a.id < b.id " +
        "CREATE (a)-[:CO_SUPPLIER {weight: 2.0}]->(b)")
      .asInstanceOf[Motif.CreateStmt]
    val created = Motif.createDf(g, st)
    assert(created.columns.toSeq == Seq("src", "dst", "rel_type", "weight"))
    val rows = created.collect()
    val deg = g.edges.filter(col("dst") === 1000001L).count()
    assert(rows.length.toLong == deg * (deg - 1) / 2, "one edge per a<b pair")
    assert(rows.forall(r => r.getString(2) == "CO_SUPPLIER" && r.getDouble(3) == 2.0))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    intercept[IllegalArgumentException](Motif.parse(
      "MATCH (a)-[:T]->(b) CREATE (a)-[:U]->(b)"))
    def badSt(s: String): String =
      intercept[IllegalArgumentException](Motif.parseStatement(s)).getMessage
    assert(badSt("MATCH (a)-[:T]->(b) CREATE (a)-[:U]->(zz)")
      .contains("not a bound node variable"))
    assert(badSt("MATCH (a)-[:T]->(b) CREATE (a)-[:U {name: 'x'}]->(b)")
      .contains("must be weight"))
  }

  test("SET compiles to the overwrite relation; bad targets rejected") {
    val st = Motif.parseStatement(
      "MATCH (s:Supplier)-[:SUPPLIES]->(p:Part {id: 1000001}) " +
        "SET s.name = 'X'").asInstanceOf[Motif.SetStmt]
    val updated = Motif.setDf(g, st)
    assert(updated.count() == g.nodes.count(), "full relation, overwrite semantics")
    val hit = updated.filter(col("name") === "X").count()
    val want = g.edges.filter(col("dst") === 1000001L).select("src").distinct().count()
    assert(hit == want && hit > 0)
    def badSt(s: String): String =
      intercept[IllegalArgumentException](Motif.parseStatement(s)).getMessage
    assert(badSt("MATCH (a)-[:T]->(b) SET a.id = 7").contains("must target name"))
    assert(badSt("MATCH (a)-[e:T]->(b) SET e.rel_type = 'x'").contains("must target weight"))
    assert(badSt("MATCH (a)-[:T]->(b) SET a.name = 7").contains("string literal"))
    assert(badSt("MATCH (a)-[:T]->(b) SET zz.name = 'x'").contains("not bound"))
  }

  test("DELETE e compiles to the surviving-edges relation") {
    val st = Motif.parseStatement(
      "MATCH (a:Supplier)-[r:SUPPLIES]->(p:Part {id: 1000001}) DELETE r")
      .asInstanceOf[Motif.DeleteStmt]
    val (n2, e2) = Motif.deleteDf(g, st)
    assert(n2.count() == g.nodes.count(), "edge delete leaves nodes untouched")
    assert(e2.columns.toSeq == Seq("src", "dst", "rel_type", "weight"))
    val victims = g.edges.filter(col("dst") === 1000001L).count()
    assert(victims > 0, "fixture: part 1000001 must have edges to delete")
    assert(e2.count() == g.edges.count() - victims)
    assert(e2.filter(col("dst") === 1000001L).count() == 0)
  }

  test("DETACH DELETE n drops the nodes AND every incident edge") {
    val st = Motif.parseStatement(
      "MATCH (p:Part) WHERE p.id <= 1000003 DETACH DELETE p")
      .asInstanceOf[Motif.DeleteStmt]
    val (n2, e2) = Motif.deleteDf(g, st)
    val victims = g.nodes
      .filter(col("label") === "Part" && col("id") <= 1000003L).count()
    assert(victims == 4) // p_partkey starts at 0 → part ids 1000000..1000003
    assert(n2.count() == g.nodes.count() - victims)
    assert(n2.filter(col("id") <= 1000003L && col("label") === "Part").count() == 0)
    assert(e2.filter(col("dst") <= 1000003L && col("dst") > PropertyGraph.PartIdOffset)
      .count() == 0, "incident edges must be gone")
    val incident = g.edges.filter(col("dst") <= 1000003L).count()
    assert(incident > 0 && e2.count() == g.edges.count() - incident)
  }

  test("DELETE validation rejects bad forms; parse() rejects deletes") {
    def badSt(s: String): String =
      intercept[IllegalArgumentException](Motif.parseStatement(s)).getMessage
    // node delete without DETACH — Cypher fails this at runtime whenever
    // edges remain; we fail it loudly at parse time
    assert(badSt("MATCH (a)-[:T]->(b) DELETE a").contains("needs DETACH DELETE"))
    // unbound targets
    assert(badSt("MATCH (a)-[:T]->(b) DELETE zz").contains("not a bound edge variable"))
    assert(badSt("MATCH (a)-[:T]->(b) DETACH DELETE zz").contains("not a bound node variable"))
    // DETACH DELETE of an edge variable is a node-form statement
    assert(badSt("MATCH (a)-[e:T]->(b) DETACH DELETE e").contains("not a bound node variable"))
    // OPTIONAL MATCH cannot feed a delete
    assert(badSt("MATCH (a)-[e:T]->(b) OPTIONAL MATCH (a)-[:U]->(c) DELETE e")
      .contains("OPTIONAL MATCH is not supported"))
    // trailing tokens after the target
    assert(badSt("MATCH (a)-[e:T]->(b) DELETE e, a").contains("trailing tokens"))
    // read-only entry point rejects the write
    intercept[IllegalArgumentException](Motif.parse("MATCH (a)-[e:T]->(b) DELETE e"))
  }
}
