package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Node and edge views — the reference's virtual tables
  * (`GraphView/View.cs`): a node view unions member node tables under a
  * property mapping with `_NodeType`/`_NodeId` discriminators
  * (`View.cs:95-136`, emission `TranslateMatchClauseVisitor.cs:560-571`);
  * an edge view unions edge columns across tables with `_EdgeType`
  * (`View.cs:830-912`); the global node view spans every table of the
  * schema (`View.cs:2046`).
  *
  * Views are plain unioned DataFrames — Catalyst prunes unreferenced
  * member columns and pushes predicates into each member's scan, so a
  * filtered view query touches only the relevant member tables' files.
  */
object Views {

  /** @param mapping viewColumn -> (memberTable -> memberColumn); members
    *                missing a view column contribute NULL (the
    *                reference's property-mapping semantics)
    */
  def nodeView(g: GraphProvider, members: Seq[String],
      mapping: Map[String, Map[String, String]]): DataFrame =
    members.map { m =>
      val t = g.nodeTable(m)
      val cols = lit(m).as("_NodeType") +:
        col("GlobalNodeId").as("_NodeId") +:
        mapping.toSeq.sortBy(_._1).map { case (viewCol, byTable) =>
          byTable.get(m) match {
            case Some(c) => col(c).as(viewCol)
            case None => lit(null).as(viewCol)
          }
        }
      t.select(cols: _*)
    }.reduce(_ unionAll _)

  /** union of one edge column across several source tables, decoded flat:
    * (_EdgeType, src _NodeType, src GlobalNodeId, sink, edgeId, attrs*)
    */
  def edgeView(g: GraphProvider,
      members: Seq[(String, String)]): DataFrame =
    members.map { case (table, edgeName) =>
      val ed = g.schema.table(table).edge(edgeName)
      val attrCols = ed.attrs.map(a => col(s"e.${a.name}").as(a.name))
      g.nodeTable(table)
        .select(col("GlobalNodeId").as("src"),
          explode(col(ed.columnName)).as("e"),
          col(ed.delColumnName).as("del"))
        .filter(!array_contains(col("del"), col("e.edgeId")))
        .select((lit(s"${table}_$edgeName").as("_EdgeType") +:
          lit(table).as("_SrcType") +:
          col("src") +:
          col("e.sink").as("sink") +:
          col("e.edgeId").as("edgeId") +:
          attrCols): _*)
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  /** global node view: every table, ids and types only */
  def globalNodeView(g: GraphProvider): DataFrame =
    nodeView(g, g.schema.tables.map(_.name), Map.empty)
}
