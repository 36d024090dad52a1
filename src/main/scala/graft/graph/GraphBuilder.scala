package graft.graph

import graft.meta._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Assembles physical node tables (adjacency-array layout, §1.1 of
  * SURVEY.md) from flat inputs. This is the Spark analogue of the
  * reference's bulk-load path (`GraphView/BulkInsert.cs:771-775`): raw
  * (src, sink, attrs) pairs are grouped per source into a sorted,
  * position-numbered `ArrayType(StructType)` adjacency column; reversed
  * columns and degree bookkeeping are derived the same way.
  *
  * Scale posture: the only shuffles are the per-edge `groupBy(src)` /
  * `groupBy(sink)` aggregations and the id joins — all key-partitioned and
  * map-side combined by Catalyst. Hub-node skew in `collect_list` is the
  * known hot spot at 100 TB; adjacency arrays for hubs should be capped or
  * the table bucketed by GlobalNodeId (AQE skew-join handles the read
  * side; the build side would use salted two-phase aggregation).
  */
object GraphBuilder {

  def gid(tableId: Int, key: Column): Column =
    shiftleft(lit(tableId.toLong), GlobalNodeId.KeyBits)
      .bitwiseOR(key.cast(LongType))

  /** Build one adjacency column: input `pairs` must have columns
    * `src` (long gid), `sink` (long gid) plus `attrs`. Output: one row
    * per distinct src with `edges: Array[Struct[sink, edgeId, attrs*]]`,
    * sorted by (sink, attrs) so `edgeId` (the position, as in the
    * reference's blob layout `NodeTableGraphViewCodeTemplate.tt:100-148`)
    * is deterministic.
    */
  def adjacency(pairs: DataFrame, attrs: Seq[EdgeAttr],
      saltFactor: Int = 1): DataFrame = {
    val attrNames = attrs.map(_.name)
    val packed = struct((col("sink") +: attrNames.map(col)): _*)
    val attrFields = attrNames.map(a => s", '$a', x.$a").mkString
    val aggregated =
      if (saltFactor <= 1)
        pairs.groupBy(col("src"))
          .agg(sort_array(collect_list(packed)).as("raw"))
      else
        // hub-skew two-phase (the SkewJoin salting idea applied to the
        // build aggregation): phase 1 collects partial lists on
        // (src, salt) so a hub's rows spread over saltFactor reducers;
        // phase 2 merges the ≤saltFactor partials per src. Output order
        // is identical — the final sort_array re-establishes the
        // deterministic (sink, attrs) order that numbers edgeIds.
        pairs
          .withColumn("__salt", pmod(hash(col("sink")), lit(saltFactor)))
          .groupBy(col("src"), col("__salt"))
          .agg(collect_list(packed).as("part"))
          .groupBy(col("src"))
          .agg(sort_array(flatten(collect_list(col("part")))).as("raw"))
    aggregated.select(col("src"),
      expr("transform(raw, (x, i) -> " +
        s"named_struct('sink', x.sink, 'edgeId', CAST(i AS INT)$attrFields))")
        .as("edges"))
  }

  /** Reversed mirror arrays from raw (src, sink, attrs) pairs: one row per
    * distinct sink with `edges: Array[Struct[sink(=src gid), edgeId(rev pos),
    * srcEdgeId(fwd pos), attrs*]]`. `srcEdgeId` carries the FORWARD
    * positional id the same pairs receive in [[adjacency]] — derived from
    * the same helper, so the two sides agree by construction. It is what
    * lets DELETE EDGE tombstone the mirror in O(deleted rows)
    * (`TranslateDataModificationVisitor.cs:288-351`).
    */
  def reversedAdjacency(pairs: DataFrame, attrs: Seq[EdgeAttr],
      saltFactor: Int = 1): DataFrame = {
    val attrNames = attrs.map(_.name)
    val numbered = adjacency(pairs, attrs, saltFactor)
      .select(col("src"), explode(col("edges")).as("__e"))
      .select((col("__e.sink").as("src") +: // group key: the original sink
        col("src").as("sink") +: // mirror points back at the source
        col("__e.edgeId").as("srcEdgeId") +:
        attrNames.map(n => col(s"__e.$n").as(n))): _*)
    reversedFromNumbered(numbered, attrs, saltFactor)
  }

  /** Reversed mirrors from pre-numbered rows
    * (src = holder sink gid, sink = source gid, srcEdgeId, attrs).
    */
  def reversedFromNumbered(numbered: DataFrame, attrs: Seq[EdgeAttr],
      saltFactor: Int = 1): DataFrame = {
    val attrNames = attrs.map(_.name)
    val packed = struct(
      (col("sink") +: col("srcEdgeId") +: attrNames.map(col)): _*)
    val attrFields = attrNames.map(a => s", '$a', x.$a").mkString
    val aggregated =
      if (saltFactor <= 1)
        numbered.groupBy(col("src"))
          .agg(sort_array(collect_list(packed)).as("raw"))
      else
        numbered
          .withColumn("__salt", pmod(hash(col("sink")), lit(saltFactor)))
          .groupBy(col("src"), col("__salt"))
          .agg(collect_list(packed).as("part"))
          .groupBy(col("src"))
          .agg(sort_array(flatten(collect_list(col("part")))).as("raw"))
    aggregated.select(col("src"),
      expr("transform(raw, (x, i) -> " +
        "named_struct('sink', x.sink, 'edgeId', CAST(i AS INT), " +
        s"'srcEdgeId', x.srcEdgeId$attrFields))").as("edges"))
  }

  /** Assemble a full node table DataFrame:
    * GlobalNodeId, nodeId/property columns, then per edge the adjacency
    * array + `<e>Del` tombstones + `<e>OutDegree`, then `InDegree`, then
    * any reversed adjacency columns for edges pointing at this table.
    *
    * @param base       the property rows (must contain `keyColumn`)
    * @param keyColumn  local key used to derive GlobalNodeId
    * @param edgePairs  per edge name: (src,sink,attrs) pairs with gid keys
    * @param incoming   (edgeDef, pairs) for every edge whose sink is this
    *                   table (drives InDegree + reversed columns)
    */
  def nodeTable(
      tableDef: NodeTableDef,
      base: DataFrame,
      keyColumn: String,
      edgePairs: Map[String, DataFrame],
      incoming: Seq[(EdgeDef, DataFrame)],
      saltFactor: Int = 1): DataFrame = {

    var df = base.withColumn("GlobalNodeId", gid(tableDef.tableId, col(keyColumn)))

    // outgoing adjacency + tombstone + out-degree per edge. The staged
    // column is renamed __edges before the join: Spark resolves column
    // names case-insensitively, so a user edge literally named "Edges"
    // would otherwise collide with the internal staging name
    tableDef.edges.foreach { e =>
      val adj = adjacency(edgePairs(e.name), e.attrs, saltFactor)
      val adjType = adj.schema("edges").dataType
      df = df
        .join(adj.withColumnRenamed("src", "__src")
          .withColumnRenamed("edges", "__edges"),
          col("GlobalNodeId") === col("__src"), "left_outer")
        .withColumn(e.columnName,
          coalesce(col("__edges"), array().cast(adjType)))
        .drop("__edges", "__src")
        .withColumn(e.delColumnName,
          array().cast(ArrayType(IntegerType)))
        .withColumn(e.outDegreeColumnName, size(col(e.columnName)))
    }

    // reversed adjacency columns (sink-side mirror of each incoming edge,
    // per GraphViewConnection.cs:1053-1146)
    incoming.foreach { case (e, pairs) =>
      val rev = reversedAdjacency(pairs, e.attrs, saltFactor)
      val revType = rev.schema("edges").dataType
      df = df
        .join(rev.withColumnRenamed("src", "__src")
          .withColumnRenamed("edges", "__edges"),
          col("GlobalNodeId") === col("__src"), "left_outer")
        .withColumn(e.reversedColumnName,
          coalesce(col("__edges"), array().cast(revType)))
        .drop("__edges", "__src")
        .withColumn(e.reversedDelColumnName,
          array().cast(ArrayType(IntegerType)))
    }

    // InDegree = total incoming edges = Σ sizes of the reversed mirrors
    // just built — no separate per-edge count aggregation/join (the
    // mirrors already grouped the same pairs by sink)
    val revCols = incoming.map { case (e, _) => e.reversedColumnName }.distinct
    df = df.withColumn("InDegree",
      if (revCols.isEmpty) lit(0)
      else revCols.map(c => size(col(c))).reduce(_ + _).cast(IntegerType))
    df
  }
}
