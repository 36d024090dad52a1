package graft.load

import graft.Stage.StageOps

import graft.ddl.GraphCatalog
import graft.dml.GraphDml
import graft.graph.GraphBuilder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk loading — the Spark re-expression of the reference's
  * `BulkInsertNode` / `BulkInsertEdge` (`GraphView/BulkInsert.cs:486,771`,
  * ~900 LoC of hand-rolled IDataReader streaming + SqlBulkCopy): here
  * it's a CSV read, two id-resolution joins, and the shared adjacency
  * aggregation. Natural keys resolve to GlobalNodeIds by joining the
  * node tables — broadcast when the dimension side is small; the edge
  * aggregation shuffles once on the source gid.
  */
object BulkLoad {

  /** Append nodes from a delimited file (header row expected). */
  def bulkInsertNode(cat: GraphCatalog, table: String, csvPath: String,
      delimiter: String = ","): Unit = {
    val td = cat.schema.table(table)
    val propTypes = cat.propertyTypes(table)
    val rows = cat.spark.read
      .option("header", "true").option("delimiter", delimiter)
      .schema(propTypes)
      .csv(csvPath)
    val keyCol = td.nodeIdColumn.getOrElse(propTypes.fieldNames.head)
    cat.rewrite(table,
      GraphDml.insertNodes(cat.provider.nodeTable(table), td, rows, keyCol))
  }

  /** Append edges from a delimited file of natural keys
    * (srcKey, sinkKey[, attrs...]); resolves both endpoints, appends the
    * adjacency + reversed side, updates degrees.
    */
  def bulkInsertEdge(cat: GraphCatalog, srcTable: String, edgeName: String,
      csvPath: String, delimiter: String = ","): Unit = {
    val td = cat.schema.table(srcTable)
    val e = td.edge(edgeName)
    val sinkTd = cat.schema.table(e.sinkTable)

    // no inferSchema: it costs a FULL extra pass over the file before
    // the real read. The authoritative types are the node tables' key
    // columns and the edge's declared attr types anyway — cast the
    // string columns to those (the same coercion the join/insert would
    // apply to inferred values, minus the inference scan)
    val raw = cat.spark.read
      .option("header", "true").option("delimiter", delimiter)
      .csv(csvPath)
    val Array(srcKey, sinkKey) = raw.columns.take(2)

    // resolve natural keys → GlobalNodeIds via the node tables' key columns
    val srcT = cat.provider.nodeTable(srcTable)
    val sinkT = cat.provider.nodeTable(e.sinkTable)
    val srcIdCol = td.nodeIdColumn.get
    val sinkIdCol = sinkTd.nodeIdColumn.get
    val srcKeyType = srcT.schema(srcIdCol).dataType
    val sinkKeyType = sinkT.schema(sinkIdCol).dataType

    val attrCols = e.attrs.map(a => col(a.name).cast(a.dataType).as(a.name))
    // id-resolution joins: plain equi-joins — AQE broadcasts the lookup
    // side when it fits and handles hot-key skew when it doesn't (a
    // forced broadcast of a node table would OOM at scale).
    // localCheckpoint cuts the lineage back to the node-table parquet so
    // the sink-side rewrite doesn't re-read files the first swap replaced
    val pairs = raw
      .join(srcT.select(col(srcIdCol).as("__sk"),
        col("GlobalNodeId").as("src")),
        col(srcKey).cast(srcKeyType) === col("__sk"))
      .join(sinkT.select(col(sinkIdCol).as("__tk"),
        col("GlobalNodeId").as("sink")),
        col(sinkKey).cast(sinkKeyType) === col("__tk"))
      .select((col("src") +: col("sink") +: attrCols): _*)
      .stageBoundary

    // forward edgeIds the insert will assign, computed against the
    // PRE-insert source table and checkpointed before the rewrite swaps
    // the parquet out from under the lineage
    val numbered = GraphDml.numberNewEdges(srcT, e, pairs).stageBoundary
    cat.rewrite(srcTable, GraphDml.insertEdges(srcT, e, pairs))
    if (e.sinkTable == srcTable) {
      // self-edge: fold both updates into one rewrite
      val t = cat.provider.nodeTable(srcTable)
      cat.rewrite(srcTable, GraphDml.insertEdgesSinkSide(t, e, numbered))
    } else {
      cat.rewrite(e.sinkTable,
        GraphDml.insertEdgesSinkSide(cat.provider.nodeTable(e.sinkTable), e, numbered))
    }
  }
}
