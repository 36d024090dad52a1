package graft.meta

import org.apache.spark.sql.types._

/** Graph-catalog metadata, mirroring the reference's 8 catalog tables
  * (`GraphView/GraphViewConnection.cs:97-108`) as plain case classes.
  *
  * A node table is an ordinary table whose columns play roles
  * (`GraphView/TSQL Syntax Tree/WGraphTableColumn.cs:35-41`): NodeId,
  * Property, or Edge. Edges live as `ArrayType(StructType)` adjacency
  * columns on the source row (the Spark analogue of the reference's
  * `varbinary(max)` adjacency blobs, `GraphView/GraphViewParser.cs:1087-1102`),
  * with a parallel `<edge>Del` tombstone array and degree columns.
  */
final case class EdgeAttr(name: String, dataType: DataType) {
  require(EdgeAttr.allowed.exists(_.getClass == dataType.getClass),
    s"edge attribute type $dataType not in the reference's 5-type system")
}
object EdgeAttr {
  /** The reference supports exactly 5 edge-attribute types
    * (`NodeTableGraphViewCodeTemplate.tt:9-16`).
    */
  val allowed: Seq[DataType] =
    Seq(IntegerType, LongType, DoubleType, StringType, BooleanType)
}

/** One edge column: `name` on `sourceTable`, pointing at `sinkTable`. */
final case class EdgeDef(
    name: String,
    sourceTable: String,
    sinkTable: String,
    attrs: Seq[EdgeAttr] = Nil) {
  def columnName: String = name
  def delColumnName: String = s"${name}Del"
  def outDegreeColumnName: String = s"${name}OutDegree"
  /** Reversed adjacency column auto-added on the sink table, mirroring
    * `GraphView/GraphViewConnection.cs:1053-1146`.
    */
  def reversedColumnName: String = s"${sourceTable}_${name}Reversed"
  /** Tombstone array for the reversed mirror — the sink-side DeleteCol the
    * reference appends to inside DELETE EDGE
    * (`TranslateDataModificationVisitor.cs:288-351`), letting a delete
    * touch only matched rows instead of rebuilding the whole mirror.
    */
  def reversedDelColumnName: String = s"${sourceTable}_${name}ReversedDel"
}

final case class NodeTableDef(
    name: String,
    tableId: Int,
    nodeIdColumn: Option[String],
    propertyColumns: Seq[String],
    edges: Seq[EdgeDef]) {
  require(tableId > 0 && tableId < (1 << 15), s"tableId $tableId out of range")
  def edge(edgeName: String): EdgeDef =
    edges.find(_.name == edgeName).getOrElse(
      throw new IllegalArgumentException(s"no edge $edgeName on table $name"))
}

final case class GraphSchema(tables: Seq[NodeTableDef]) {
  private val byName = tables.map(t => t.name -> t).toMap
  def table(name: String): NodeTableDef = byName.getOrElse(name,
    throw new IllegalArgumentException(s"unknown node table $name"))
  def hasTable(name: String): Boolean = byName.contains(name)
  /** All edges across all tables whose sink is `tableName` (used for
    * InDegree maintenance and reversed-column generation).
    */
  def incomingEdges(tableName: String): Seq[EdgeDef] =
    tables.flatMap(_.edges).filter(_.sinkTable == tableName)
}

object GlobalNodeId {
  /** GlobalNodeId = tableId << 48 | localKey — globally unique across
    * node tables, mirroring the reference's IDENTITY seed
    * (`GraphView/GraphViewConnection.cs:877-886`).
    */
  val KeyBits = 48
  def pack(tableId: Int, localKey: Long): Long =
    (tableId.toLong << KeyBits) | localKey
  def tableIdOf(gid: Long): Int = (gid >>> KeyBits).toInt
  def localKeyOf(gid: Long): Long = gid & ((1L << KeyBits) - 1)
}
