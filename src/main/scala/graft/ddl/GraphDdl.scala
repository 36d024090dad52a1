package graft.ddl

import graft.meta._
import org.apache.spark.sql.types._

/** DDL for node tables — a cleaned-up form of the reference's annotated
  * CREATE TABLE grammar (`GraphView/GraphViewParser.cs:559-716`, column
  * roles `WGraphTableColumn.cs:35-41`). Where the reference writes
  * `[ColumnRole:"Edge", Reference:"People"] Knows varbinary(max)`, this
  * dialect says `EDGE Knows TO People (weight DOUBLE)`:
  *
  * {{{
  * CREATE NODE TABLE People (
  *   id INT NODEID,
  *   name STRING,
  *   EDGE Knows TO People (weight DOUBLE, kind STRING)
  * )
  * }}}
  */
object GraphDdl {

  private val CreateRe =
    """(?is)^\s*CREATE\s+NODE\s+TABLE\s+(\w+)\s*\((.*)\)\s*$""".r
  private val EdgeRe =
    """(?is)^EDGE\s+(\w+)\s+TO\s+(\w+)\s*(?:\((.*)\))?$""".r

  def isCreateNodeTable(sql: String): Boolean =
    CreateRe.findFirstIn(sql).isDefined

  /** Parse into (tableDef-with-placeholder-id, property StructType);
    * the catalog assigns the real tableId at creation.
    */
  def parseCreateNodeTable(sql: String, tableId: Int): (NodeTableDef, StructType) =
    sql match {
      case CreateRe(name, body) =>
        var nodeId: Option[String] = None
        val props = Seq.newBuilder[StructField]
        val edges = Seq.newBuilder[EdgeDef]
        splitTopLevel(body).foreach { item =>
          EdgeRe.findFirstMatchIn(item) match {
            case Some(m) =>
              val attrs = Option(m.group(3)).toSeq.flatMap(splitTopLevel)
                .map { a =>
                  val Array(an, at) = a.trim.split("\\s+", 2)
                  EdgeAttr(an, parseType(at))
                }
              edges += EdgeDef(m.group(1), name, m.group(2), attrs)
            case None =>
              val parts = item.trim.split("\\s+")
              require(parts.length >= 2, s"bad column def: $item")
              val (cn, ct) = (parts(0), parts(1))
              props += StructField(cn, parseType(ct))
              if (parts.length > 2 && parts(2).equalsIgnoreCase("NODEID")) {
                require(nodeId.isEmpty, "multiple NODEID columns")
                nodeId = Some(cn)
              }
          }
        }
        val fields = props.result()
        val td = NodeTableDef(name, tableId, nodeId,
          fields.map(_.name).filterNot(nodeId.contains), edges.result())
        (td, StructType(fields))
      case _ => throw new IllegalArgumentException(s"not CREATE NODE TABLE: $sql")
    }

  /** post-hoc schema evolution, mirroring the reference's
    * `AddNodeTableColumn`/`DropNodeTableColumn`
    * (`GraphViewConnection.cs:1855`, `:2299`) incl. edge columns with
    * reversed-column upkeep:
    * {{{
    *   ALTER TABLE T ADD COLUMN c TYPE
    *   ALTER TABLE T DROP COLUMN c
    *   ALTER TABLE T ADD EDGE e TO Sink [(attr TYPE, ...)]
    *   ALTER TABLE T DROP EDGE e
    * }}}
    */
  sealed trait AlterStmt
  final case class AddColumn(table: String, field: StructField) extends AlterStmt
  final case class DropColumn(table: String, column: String) extends AlterStmt
  final case class AddEdge(table: String, edge: EdgeDef) extends AlterStmt
  final case class DropEdge(table: String, edge: String) extends AlterStmt

  private val AlterAddColRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+(\w+(?:\s*\([^)]*\))?)\s*$""".r
  private val AlterDropColRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*$""".r
  private val AlterAddEdgeRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+EDGE\s+(\w+)\s+TO\s+(\w+)\s*(?:\((.*)\))?\s*$""".r
  private val AlterDropEdgeRe =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+EDGE\s+(\w+)\s*$""".r

  private val DropNodeTableRe =
    """(?is)^\s*DROP\s+NODE\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*$""".r

  /** `DROP NODE TABLE [IF EXISTS] T` → (ifExists, table) — the
    * reference's `GraphViewConnection.DropNodeTable`
    * (`GraphViewConnection.cs:1496`)
    */
  def parseDropNodeTable(sql: String): Option[(Boolean, String)] = sql match {
    case DropNodeTableRe(ifex, name) => Some((ifex != null, name))
    case _ => None
  }

  def parseAlter(sql: String): Option[AlterStmt] = sql match {
    case AlterAddEdgeRe(t, e, sink, attrs) =>
      val as = Option(attrs).toSeq.flatMap(splitTopLevel).map { a =>
        val Array(an, at) = a.trim.split("\\s+", 2)
        EdgeAttr(an, parseType(at))
      }
      Some(AddEdge(t, EdgeDef(e, t, sink, as)))
    case AlterDropEdgeRe(t, e) => Some(DropEdge(t, e))
    case AlterAddColRe(t, c, tp) => Some(AddColumn(t, StructField(c, parseType(tp))))
    case AlterDropColRe(t, c) => Some(DropColumn(t, c))
    case _ => None
  }

  private def parseType(t: String): DataType = t.trim.toUpperCase match {
    case "INT" | "INTEGER" => IntegerType
    case "BIGINT" | "LONG" => LongType
    case "DOUBLE" => DoubleType
    case "STRING" | "VARCHAR" | "TEXT" => StringType
    // T-SQL length-parameterized character types (VARCHAR(20) etc.) —
    // length is advisory, Spark strings are unbounded
    case v if v.startsWith("VARCHAR(") || v.startsWith("NVARCHAR(") ||
      v.startsWith("CHAR(") || v.startsWith("NCHAR(") => StringType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "DATE" => DateType
    case "TIMESTAMP" => TimestampType
    case d if d.startsWith("DECIMAL") =>
      val ps = d.stripPrefix("DECIMAL").trim.stripPrefix("(").stripSuffix(")")
      val Array(p, s) = ps.split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** split on commas outside parentheses */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }
}
