package graft.lang

import graft.graph.{EdgeViewDef, NodeViewDef}
import graft.meta.GraphSchema

/** SQL surface for view DDL — the reference's
  * `CreateNodeView(query)` / `CreateEdgeView(query)` statement parsers
  * (`View.cs:689-721`, `873-903`) and drop statements (`View.cs:723`,
  * `2014`), with the `CreateViewVisitor.cs` mapping semantics:
  *
  * {{{
  *   CREATE NODE VIEW NV AS
  *     SELECT c1 AS v1, NULL AS v2 FROM T1
  *     UNION ALL
  *     SELECT x1, x2 FROM T2          -- positional after the 1st block
  *
  *   CREATE EDGE VIEW NV.EV AS
  *     SELECT attr AS a FROM T1.e1
  *     UNION ALL
  *     SELECT attr2 FROM T2.e2
  *
  *   DROP NODE VIEW NV
  *   DROP EDGE VIEW NV.EV
  * }}}
  *
  * First-block aliases name the view columns; subsequent blocks map by
  * position (`CreateViewVisitor.cs:252-330`); `NULL` skips the member
  * for that column; `SELECT *` in every block = default merge (union of
  * member columns by name); a single bare `SELECT NULL` = no columns.
  */
object ViewDdl {

  val CreateNodeViewRe =
    """(?is)^\s*CREATE\s+NODE\s+VIEW\s+(\w+)\s+AS\s+(.*)$""".r
  val CreateEdgeViewRe =
    """(?is)^\s*CREATE\s+EDGE\s+VIEW\s+(\w+)\.(\w+)\s+AS\s+(.*)$""".r
  val DropNodeViewRe =
    """(?is)^\s*DROP\s+NODE\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*$""".r
  val DropEdgeViewRe =
    """(?is)^\s*DROP\s+EDGE\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(\w+)\.(\w+)\s*$""".r

  sealed trait Element
  final case class ColRef(column: String, alias: Option[String]) extends Element
  final case class NullLit(alias: Option[String]) extends Element
  case object Star extends Element

  final case class SelectBlock(elems: Seq[Element], table: String,
      edge: Option[String])

  /** split the view body on top-level UNION ALL (outside quotes,
    * comments and parens — [[SqlLex]]-mask-aware like every other
    * dialect splitter)
    */
  private def splitUnionAll(body: String): Seq[String] = {
    val m = SqlLex.mask(body)
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    val upper = body.toUpperCase
    var i = 0
    val kw = "UNION ALL"
    while (i < body.length) {
      if (!m(i)) body(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 &&
            upper.regionMatches(i, kw, 0, kw.length) &&
            (i == 0 || upper(i - 1).isWhitespace) &&
            (i + kw.length >= body.length || upper(i + kw.length).isWhitespace)) {
            out += body.substring(start, i).trim
            start = i + kw.length
            i += kw.length - 1
          }
      }
      i += 1
    }
    out += body.substring(start).trim
    out.result().filter(_.nonEmpty)
  }

  private val BlockRe =
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\.(\w+))?\s*$""".r

  private val AsRe = """(?is)^(.+?)\s+AS\s+(\w+)$""".r
  private val SpaceAliasRe = """(?is)^(\S+)\s+(\w+)$""".r

  private def parseElement(s: String): Element = {
    val t = s.trim
    if (t == "*") Star
    else {
      val (e, alias) = t match {
        case AsRe(x, a) => (x.trim, Some(a))
        case SpaceAliasRe(x, a) => (x.trim, Some(a))
        case _ => (t, None)
      }
      if (e.equalsIgnoreCase("null")) NullLit(alias) else ColRef(e, alias)
    }
  }

  def parseBlocks(body: String): Seq[SelectBlock] =
    splitUnionAll(body).map {
      case BlockRe(elems, table, edge) =>
        SelectBlock(GraphSql.splitTopLevelParen(elems).map(parseElement),
          table, Option(edge))
      case other => throw new IllegalArgumentException(
        s"bad view SELECT block: $other")
    }

  /** `CreateViewVisitor.cs` NodeViewSelectStatementVisitor semantics */
  def nodeView(name: String, body: String, schema: GraphSchema): NodeViewDef = {
    val blocks = parseBlocks(body)
    require(blocks.nonEmpty, s"node view $name: empty body")
    blocks.foreach { b =>
      require(b.edge.isEmpty,
        s"node view $name: FROM must reference a node table, not ${b.table}.${b.edge.get}")
      require(schema.hasTable(b.table), s"unknown node table ${b.table}")
    }
    val members = blocks.map(_.table)
    require(members.distinct.size == members.size,
      s"node view $name: duplicate member tables")

    if (blocks.forall(_.elems == Seq(Star))) {
      // default merge: union of member columns (NodeId + properties) by name
      val colsOf = members.map { m =>
        val td = schema.table(m)
        m -> (td.nodeIdColumn.toSeq ++ td.propertyColumns)
      }.toMap
      val ordered = members.flatMap(colsOf).distinct
      val mapping = ordered.map(c =>
        c -> members.filter(m => colsOf(m).contains(c)).map(m => m -> c).toMap)
      NodeViewDef(name, members, mapping)
    } else if (blocks.forall(_.elems == Seq(NullLit(None)))) {
      NodeViewDef(name, members, Nil) // discriminator-only view
    } else {
      val first = blocks.head.elems
      require(!blocks.exists(_.elems.contains(Star)),
        s"node view $name: SELECT * must be used in every block or none")
      val viewCols = first.map {
        case ColRef(c, a) => a.getOrElse(c)
        case NullLit(Some(a)) => a
        case NullLit(None) => throw new IllegalArgumentException(
          s"node view $name: NULL in the first block needs a column alias")
        case Star => throw new IllegalStateException("unreachable")
      }
      require(viewCols.distinct.size == viewCols.size,
        s"node view $name: duplicate view column names $viewCols")
      val mapping = scala.collection.mutable.LinkedHashMap[String,
        Map[String, String]](viewCols.map(_ -> Map.empty[String, String]): _*)
      blocks.zipWithIndex.foreach { case (b, bi) =>
        require(b.elems.size == first.size,
          s"node view $name: block ${bi + 1} has ${b.elems.size} select " +
            s"elements, expected ${first.size}")
        b.elems.zipWithIndex.foreach {
          case (ColRef(c, _), i) =>
            mapping(viewCols(i)) += b.table -> c
          case (NullLit(_), _) => ()
          case (Star, _) => ()
        }
      }
      NodeViewDef(name, members, mapping.toSeq)
    }
  }

  /** `CreateViewVisitor.cs` EdgeViewSelectStatementVisitor semantics.
    * `sinkOf` resolves the view edge's sink: the common member sink, or
    * an existing node view covering all member sinks.
    */
  def edgeView(viewTable: String, name: String, body: String,
      schema: GraphSchema, nodeViews: Seq[NodeViewDef]): EdgeViewDef = {
    val blocks = parseBlocks(body)
    require(blocks.nonEmpty, s"edge view $viewTable.$name: empty body")
    val members = blocks.map { b =>
      val e = b.edge.getOrElse(throw new IllegalArgumentException(
        s"edge view $viewTable.$name: FROM must be Table.edge, got ${b.table}"))
      require(schema.hasTable(b.table), s"unknown node table ${b.table}")
      require(schema.table(b.table).edges.exists(_.name == e),
        s"table ${b.table} has no edge $e")
      (b.table, e)
    }
    require(members.distinct.size == members.size,
      s"edge view $viewTable.$name: duplicate member edges")

    val attrMapping: Seq[(String, Map[(String, String), String])] =
      if (blocks.forall(_.elems == Seq(Star)))
        defaultAttrMerge(members, schema)
      else if (blocks.forall(_.elems == Seq(NullLit(None)))) Nil
      else {
        val first = blocks.head.elems
        val attrNames = first.map {
          case ColRef(c, a) => a.getOrElse(c)
          case NullLit(Some(a)) => a
          case NullLit(None) => throw new IllegalArgumentException(
            s"edge view $viewTable.$name: NULL in the first block needs an alias")
          case Star => throw new IllegalStateException("unreachable")
        }
        val mapping = scala.collection.mutable.LinkedHashMap[String,
          Map[(String, String), String]](
          attrNames.map(_ -> Map.empty[(String, String), String]): _*)
        blocks.zip(members).foreach { case (b, mKey) =>
          require(b.elems.size == first.size,
            s"edge view $viewTable.$name: inconsistent select element count")
          b.elems.zipWithIndex.foreach {
            case (ColRef(c, _), i) => mapping(attrNames(i)) += mKey -> c
            case _ => ()
          }
        }
        mapping.toSeq
      }

    EdgeViewDef(name, viewTable, resolveSink(viewTable, name, members,
      schema, nodeViews), members, attrMapping)
  }

  /** default merge: union of member edge attr names, in first-appearance
    * order; a member maps an attr iff it carries one of that name
    */
  def defaultAttrMerge(members: Seq[(String, String)], schema: GraphSchema)
      : Seq[(String, Map[(String, String), String])] = {
    val attrsOf = members.map { case (m, me) =>
      (m, me) -> schema.table(m).edge(me).attrs.map(_.name)
    }.toMap
    members.flatMap(attrsOf).distinct.map(a =>
      a -> members.filter(mk => attrsOf(mk).contains(a))
        .map(mk => mk -> a).toMap)
  }

  /** Common member sink table, else a registered node view covering all
    * member sinks (smallest exact match first) — the dst a MATCH hop
    * over this edge view must bind to.
    */
  def resolveSink(viewTable: String, name: String,
      members: Seq[(String, String)], schema: GraphSchema,
      nodeViews: Seq[NodeViewDef]): String = {
    val sinks = members.map { case (m, me) =>
      schema.table(m).edge(me).sinkTable
    }.distinct
    if (sinks.size == 1) sinks.head
    else nodeViews
      .filter(v => sinks.forall(v.members.contains))
      .sortBy(v => (v.members.size, v.name))
      .headOption.map(_.name)
      .getOrElse(throw new IllegalArgumentException(
        s"edge view $viewTable.$name: member edges sink to " +
          s"${sinks.mkString(", ")} — create a node view over those " +
          "tables first"))
  }
}
