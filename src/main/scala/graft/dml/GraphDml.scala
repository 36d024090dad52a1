package graft.dml

import graft.graph.{GraphBuilder, GraphProvider}
import graft.meta._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph DML as functional table rewrites (SURVEY §2.9). Where the
  * reference compiles INSERT/DELETE NODE/EDGE into CTE+UPDATE bundles
  * over adjacency blobs (`TranslateDataModificationVisitor.cs`), here each
  * statement is a DataFrame→DataFrame transform of the node table:
  * columnar array rewrite instead of `.WRITE` blob appends. On a real
  * deployment each transform commits as one table rewrite (Delta MERGE);
  * in-memory callers just re-point their provider at the result.
  */
object GraphDml {

  private def attrFields(e: EdgeDef): String =
    e.attrs.map(a => s", '${a.name}', x.${a.name}").mkString

  /** INSERT EDGE, source side: append `newPairs` (src,sink,attrs gid rows)
    * to the adjacency column. Appended edges continue the positional id
    * sequence (the decoder-numbering of the reference's blob append,
    * `TranslateDataModificationVisitor.cs:357-380`); OutDegree increments.
    */
  def insertEdges(table: DataFrame, e: EdgeDef, newPairs: DataFrame): DataFrame = {
    val adj = GraphBuilder.adjacency(newPairs, e.attrs)
    val c = e.columnName
    // staging column renamed __edges: name resolution is case-insensitive,
    // so an edge column literally named "Edges" would collide otherwise
    table
      .join(adj.withColumnRenamed("src", "__src")
        .withColumnRenamed("edges", "__edges"),
        col("GlobalNodeId") === col("__src"), "left_outer")
      .withColumn(c,
        when(col("__edges").isNull, col(c))
          .otherwise(concat(col(c), expr(
            s"transform(__edges, x -> named_struct('sink', x.sink, " +
              s"'edgeId', CAST(x.edgeId + size($c) AS INT)${attrFields(e)}))"))))
      .drop("__edges", "__src")
      .withColumn(e.outDegreeColumnName, size(col(c)) - size(col(e.delColumnName)))
  }

  /** Assign each new (src, sink, attrs) pair the FORWARD edgeId that
    * [[insertEdges]] will give it (within-batch position from the shared
    * [[GraphBuilder.adjacency]] numbering, offset by the source row's
    * current adjacency size). Run against the PRE-insert source table and
    * checkpoint the result before rewriting either side — the sink-side
    * mirror needs these ids for its `srcEdgeId` field.
    */
  def numberNewEdges(srcTable: DataFrame, e: EdgeDef,
      newPairs: DataFrame): DataFrame = {
    val offs = srcTable.select(col("GlobalNodeId").as("src"),
      size(col(e.columnName)).as("__off"))
    GraphBuilder.adjacency(newPairs, e.attrs)
      .join(offs, Seq("src"), "left_outer")
      .select(col("src"), explode(col("edges")).as("__e"),
        coalesce(col("__off"), lit(0)).as("__off"))
      .select((col("src") +: col("__e.sink").as("sink") +:
        (col("__e.edgeId") + col("__off")).cast(IntegerType).as("srcEdgeId") +:
        e.attrs.map(a => col(s"__e.${a.name}").as(a.name))): _*)
  }

  /** INSERT EDGE, sink side: bump InDegree and mirror into the reversed
    * adjacency column (`TranslateDataModificationVisitor.cs:288-351`).
    * `numbered` must come from [[numberNewEdges]] (carries the forward
    * `srcEdgeId` each mirror records).
    */
  def insertEdgesSinkSide(sinkTable: DataFrame, e: EdgeDef,
      numbered: DataFrame): DataFrame = {
    val attrNames = e.attrs.map(_.name)
    val packed = struct((col("src").as("sink") +: col("srcEdgeId") +:
      attrNames.map(col)): _*)
    val rev = numbered.groupBy(col("sink"))
      .agg(sort_array(collect_list(packed)).as("__edges"))
    val rc = e.reversedColumnName
    sinkTable
      .join(rev.withColumnRenamed("sink", "__sk"),
        col("GlobalNodeId") === col("__sk"), "left_outer")
      .withColumn("InDegree",
        col("InDegree") +
          when(col("__edges").isNull, 0).otherwise(size(col("__edges"))))
      .withColumn(rc,
        when(col("__edges").isNull, col(rc))
          .otherwise(concat(col(rc), expr(
            s"transform(__edges, (x, i) -> named_struct('sink', x.sink, " +
              s"'edgeId', CAST(i + size($rc) AS INT), " +
              s"'srcEdgeId', x.srcEdgeId${attrFields(e)}))"))))
      .drop("__edges", "__sk")
  }

  /** DELETE EDGE: tombstone `(src, edgeId)` pairs into `<e>Del` and
    * decrement the live-degree, leaving the adjacency array untouched
    * until compaction — the reference's DeleteCol mechanism
    * (`GraphViewParser.cs:1103-1112`).
    */
  def deleteEdges(table: DataFrame, e: EdgeDef, doomed: DataFrame): DataFrame = {
    val del = doomed.groupBy(col("src"))
      .agg(collect_list(col("edgeId").cast(IntegerType)).as("__newDel"))
    table
      .join(del.withColumnRenamed("src", "__src"),
        col("GlobalNodeId") === col("__src"), "left_outer")
      .withColumn(e.delColumnName,
        when(col("__newDel").isNull, col(e.delColumnName))
          .otherwise(concat(col(e.delColumnName), col("__newDel"))))
      .withColumn(e.outDegreeColumnName,
        size(col(e.columnName)) - size(col(e.delColumnName)))
      .drop("__newDel", "__src")
  }

  /** DELETE EDGE, sink side: tombstone the reversed mirrors of the doomed
    * forward edges into `<e>ReversedDel` and decrement InDegree — the
    * incremental sink-side DeleteCol append of the reference
    * (`TranslateDataModificationVisitor.cs:288-351`, reversed clause
    * `1829-1897`). `doomed` must carry (src, edgeId, sink); cost is one
    * keyed join touching only the sink rows that actually lost an edge —
    * O(deleted), never a mirror rebuild.
    */
  def deleteEdgesSinkSide(sinkTable: DataFrame, e: EdgeDef,
      doomed: DataFrame): DataFrame = {
    val del = doomed.groupBy(col("sink"))
      .agg(collect_list(struct(col("src"),
        col("edgeId").cast(IntegerType).as("edgeId"))).as("__doomed"))
    val rc = e.reversedColumnName
    val rdc = e.reversedDelColumnName
    sinkTable
      .join(del.withColumnRenamed("sink", "__sk"),
        col("GlobalNodeId") === col("__sk"), "left_outer")
      .withColumn("__newRevDel",
        when(col("__doomed").isNull, array().cast(ArrayType(IntegerType)))
          .otherwise(expr(
            s"transform(filter($rc, x -> exists(__doomed, " +
              "d -> d.src = x.sink AND d.edgeId = x.srcEdgeId)), " +
              "x -> x.edgeId)")))
      .withColumn(rdc, concat(col(rdc), col("__newRevDel")))
      .withColumn("InDegree",
        (col("InDegree") - size(col("__newRevDel"))).cast(IntegerType))
      .drop("__doomed", "__newRevDel", "__sk")
  }

  /** Rebuild the sink table's reversed mirror from the source table's
    * LIVE forward edges and clear its reversed tombstones — the
    * compaction-time resync (`GraphViewConnection.cs:2995-3115`; run after
    * [[compact]] since compaction renumbers forward edgeIds, which the
    * mirrors' `srcEdgeId` references). DELETE EDGE itself stays
    * incremental via [[deleteEdgesSinkSide]].
    */
  def syncReversed(srcTable: DataFrame, sinkTable: DataFrame,
      e: EdgeDef): DataFrame = {
    val live = srcTable
      .select(col("GlobalNodeId").as("__fsrc"), explode(col(e.columnName)).as("__e"),
        col(e.delColumnName).as("__del"))
      .filter(!array_contains(col("__del"), col("__e.edgeId")))
      .select((col("__e.sink").as("src") +: // group key: the sink holder
        col("__fsrc").as("sink") +:
        col("__e.edgeId").as("srcEdgeId") +:
        e.attrs.map(a => col(s"__e.${a.name}").as(a.name))): _*)
    val rev = GraphBuilder.reversedFromNumbered(live, e.attrs)
    val rc = e.reversedColumnName
    val rdc = e.reversedDelColumnName
    val revType = rev.schema("edges").dataType
    val synced = sinkTable.drop(rc)
      .join(rev.withColumnRenamed("src", "__src")
        .withColumnRenamed("edges", "__edges"),
        col("GlobalNodeId") === col("__src"), "left_outer")
      .withColumn(rc, coalesce(col("__edges"), array().cast(revType)))
      .drop("__edges", "__src")
      .withColumn(rdc, array().cast(ArrayType(IntegerType)))
    // InDegree = live incoming edges = Σ (mirror size − mirror tombstones)
    // (the reference's sink-side decrement,
    // TranslateDataModificationVisitor.cs:381-410)
    val revCols = synced.columns.filter(_.endsWith("Reversed"))
    synced.withColumn("InDegree",
      revCols.map { c =>
        val d = s"${c}Del"
        if (synced.columns.contains(d)) size(col(c)) - size(col(d))
        else size(col(c))
      }.reduce(_ + _).cast(IntegerType))
  }

  /** Tombstone compaction: rebuild the adjacency minus deleted ids and
    * clear the tombstones — the reference's `Recycle` /
    * `MergeDeleteColumn` job (`NodeTableGraphViewCodeTemplate.tt:373-453`,
    * `GraphViewConnection.cs:2995-3115`). EdgeIds renumber positionally,
    * exactly as the blob decoder would after a rebuild. Because the sink
    * mirrors' `srcEdgeId` references the pre-compaction numbering, follow
    * with [[syncReversed]] on each sink (as [[graft.ddl.GraphCatalog.compactAll]] does)
    * before any further reversed-side DML.
    */
  def compact(table: DataFrame, e: EdgeDef): DataFrame = {
    val c = e.columnName
    table
      .withColumn(c, expr(
        s"transform(filter($c, x -> NOT array_contains(${e.delColumnName}, x.edgeId)), " +
          s"(x, i) -> named_struct('sink', x.sink, 'edgeId', CAST(i AS INT)${attrFields(e)}))"))
      .withColumn(e.delColumnName, array().cast(ArrayType(IntegerType)))
      .withColumn(e.outDegreeColumnName, size(col(c)))
  }

  /** INSERT NODE: append property rows; every graph-maintained column
    * (adjacency, tombstones, degrees, reversed) starts empty/zero —
    * `ConvertGraphModificationStatementVisitor.cs:38-135`.
    *
    * GlobalNodeId assignment mirrors the reference's IDENTITY seed
    * (`GraphViewConnection.cs:877-886`): numeric NodeIds pack directly
    * (tableId<<48|key); non-numeric NodeIds get sequential surrogate
    * local ids continuing after the table's current max — the IDENTITY
    * analogue (serial at load time, like SQL Server's).
    */
  def insertNodes(table: DataFrame, td: NodeTableDef, rows: DataFrame,
      keyColumn: String): DataFrame = {
    var newRows = rows.schema(keyColumn).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        rows.withColumn("GlobalNodeId",
          GraphBuilder.gid(td.tableId, col(keyColumn)))
      case _ =>
        val mask = (1L << GlobalNodeId.KeyBits) - 1
        val maxLocal = table
          .agg(coalesce(max(col("GlobalNodeId").bitwiseAND(lit(mask))), lit(0L)))
          .head().getLong(0)
        // dense sequential surrogates via distributed zipWithIndex on the
        // sorted rows — no global single-partition Window
        val sorted = rows.orderBy(col(keyColumn))
        val schema = org.apache.spark.sql.types.StructType(
          sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
            "__local", org.apache.spark.sql.types.LongType, nullable = false))
        sorted.sparkSession.createDataFrame(
          sorted.rdd.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1 + maxLocal)) },
          schema)
          .withColumn("GlobalNodeId", GraphBuilder.gid(td.tableId, col("__local")))
          .drop("__local")
    }
    // PK enforcement, as the reference's IDENTITY/unique constraint would
    // reject the insert (GraphViewParser.cs:1167-1198): an id collision
    // would silently double-count every traversal touching the node
    val collisions = newRows
      .join(table.select(col("GlobalNodeId")), Seq("GlobalNodeId"), "left_semi")
      .count()
    if (collisions > 0) throw new IllegalStateException(
      s"INSERT NODE on ${td.name}: $collisions row(s) collide with existing " +
        "GlobalNodeIds (primary-key violation)")
    table.schema.fields.foreach { f =>
      if (!newRows.columns.contains(f.name)) {
        val default = f.dataType match {
          case a: ArrayType => array().cast(a)
          case IntegerType => lit(0).cast(IntegerType)
          case dt => lit(null).cast(dt)
        }
        newRows = newRows.withColumn(f.name, default)
      }
    }
    table.unionByName(newRows.select(table.columns.map(col).toSeq: _*))
  }

  /** UPDATE of node property columns (the reference parses and delegates
    * plain UPDATE with graph tables, `WSqlParser.cs:799-909`,
    * `WClauses.cs:356-446`): set each listed column where `pred` holds.
    * All assignment expressions evaluate against the OLD row values
    * (standard UPDATE semantics). Graph-maintained columns (ids,
    * adjacency, tombstones, degrees, reversed mirrors) and the NodeId
    * key are immutable.
    */
  def updateProperties(table: DataFrame, td: NodeTableDef,
      assignments: Seq[(String, org.apache.spark.sql.Column)],
      pred: org.apache.spark.sql.Column): DataFrame = {
    val internal = Set("GlobalNodeId", "InDegree") ++
      td.edges.flatMap(e =>
        Seq(e.columnName, e.delColumnName, e.outDegreeColumnName)) ++
      table.columns.filter(c =>
        c.endsWith("Reversed") || c.endsWith("ReversedDel"))
    assignments.foreach { case (c, _) =>
      require(table.columns.contains(c), s"no column $c on ${td.name}")
      require(!internal(c), s"column $c is graph-maintained and cannot be updated")
      require(!td.nodeIdColumn.contains(c), s"NodeId column $c is immutable")
    }
    // stage new values in temp columns first so every expression reads
    // the pre-update row
    val staged = assignments.zipWithIndex.foldLeft(table) {
      case (t, ((c, e), i)) =>
        t.withColumn(s"__upd_$i", when(pred, e).otherwise(col(c)))
    }
    assignments.zipWithIndex.foldLeft(staged) {
      case (t, ((c, _), i)) =>
        t.withColumn(c, col(s"__upd_$i")).drop(s"__upd_$i")
    }
  }

  /** DELETE NODE with the reference's safety guard: refuses when any
    * matching node still has live edges (InDegree or any OutDegree != 0)
    * — `TranslateDataModificationVisitor.cs:2085-2188`.
    */
  def deleteNodes(table: DataFrame, td: NodeTableDef,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val degreeCols = col("InDegree") +:
      td.edges.map(e => col(e.outDegreeColumnName))
    val hasEdges = degreeCols.map(_ =!= 0).reduce(_ || _)
    val violations = table.filter(pred && hasEdges).count()
    if (violations > 0) throw new IllegalStateException(
      s"DELETE NODE on ${td.name}: $violations matching node(s) still have edges")
    table.filter(!pred)
  }
}
