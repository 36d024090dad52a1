package graft.paths

import graft.Stage.StageOps

import graft.graph.GraphProvider
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Variable-length path traversal — the Spark re-expression of the
  * reference's recursive-CTE `bfsPath` TVFs
  * (`DeployScriptTemplate.tt:68-147`, exclusive generators
  * `NodeTableGraphViewCodeTemplate.tt:193-371`):
  *
  *  - walks are EDGE-disjoint by default (an edge instance is used at most
  *    once per path; cycles through nodes are allowed) — `EdgeDisjoint`;
  *  - `bfsPath_DifferNodes` variant: NODE-disjoint (no node revisited,
  *    including the start) — `NodeDisjoint`;
  *  - `minLen = 0` emits the zero-length row (sink = source,
  *    `DeployScriptTemplate.tt:110-114`);
  *  - `maxLen = -1` means unbounded (`*`): iterate to fixpoint;
  *  - per-edge attr equality predicates apply at every hop
  *    (`DeployScriptTemplate.tt:86-91`).
  *
  * Execution is an iterative DataFrame loop: each hop joins the frontier
  * to the node table's adjacency on GlobalNodeId and explodes it. Bounded
  * small expansions stay one declarative plan (Catalyst sees the whole
  * unrolled join tree); unbounded ones `localCheckpoint` each iteration to
  * truncate lineage — the standard Spark pattern for iterative graph
  * algorithms. At 100 TB the frontier join is a key-partitioned shuffle
  * per hop; AQE re-plans per iteration since each checkpoint re-derives
  * stats.
  */
object PathExpand {

  sealed trait Mode
  case object EdgeDisjoint extends Mode
  case object NodeDisjoint extends Mode

  private val LocalKeyMask = (1L << graft.meta.GlobalNodeId.KeyBits) - 1

  /** Expand `table`-[`edgeName` * minLen..maxLen]->`table`.
    *
    * Output columns:
    *   `src`, `dst` (GlobalNodeIds), `hops` (int),
    *   `pathNodes` Array[Long] (node sequence incl. src and dst),
    *   `pathEdges` Array[Struct[node Long, edgeId Int]] (edges taken).
    *
    * @param seeds  optional one-column (`id`) DataFrame restricting the
    *   expansion's origin set — the 100 TB shape: a selective bound
    *   endpoint seeds the walk instead of enumerating paths from every
    *   node in the graph
    * @param backward  walk the REVERSED adjacency from the seed side:
    *   seeds are interpreted as path *destinations* and the walk runs
    *   sink→source (`MatchGraphInterface.cs:118-129` direction choice).
    *   Output schema and semantics are identical to forward expansion
    *   (src/dst swapped back, pathNodes re-reversed); edge-disjointness
    *   keys on the reversed holder's (node, edgeId), which is unique per
    *   physical edge.
    */
  def expand(
      g: GraphProvider,
      table: String,
      edgeName: String,
      minLen: Int,
      maxLen: Int,
      mode: Mode = EdgeDisjoint,
      attrEq: Map[String, Any] = Map.empty,
      maxIterations: Int = 64,
      seeds: Option[DataFrame] = None,
      backward: Boolean = false,
      display: Boolean = false): DataFrame = {
    require(minLen >= 0, "minLen must be >= 0")
    require(!display || !backward, "typed display requires forward expansion")
    val td = g.schema.table(table)
    val ed = td.edge(edgeName)
    require(ed.sinkTable == table,
      s"var-length paths require a self-referencing edge; $edgeName sinks to ${ed.sinkTable}")

    val nt = g.nodeTable(table)
    // adjacency relation for the step join: node → (edges, tombstones).
    // Each direction filters its own tombstone column (forward DeleteCol /
    // reversed mirror DeleteCol, both appended incrementally by DML).
    // Holders with an EMPTY adjacency are dropped map-side before the
    // step shuffle — they can contribute no step rows, and over a view
    // union this prunes entire non-contributing member tables (e.g. a
    // sink-only member) from every hop's frontier join.
    val adj = (
      if (!backward)
        nt.select(col("GlobalNodeId").as("__node"),
          col(ed.columnName).as("__adj"), col(ed.delColumnName).as("__del"))
      else
        nt.select(col("GlobalNodeId").as("__node"),
          col(ed.reversedColumnName).as("__adj"),
          col(ed.reversedDelColumnName).as("__del"))
      ).filter(size(col("__adj")) > 0)

    val edgeKeyType = ArrayType(StructType(Seq(
      StructField("node", LongType), StructField("edgeId", IntegerType))))
    // per-hop typed display record: departing node + edge taken (the
    // reference's PathMessage, NodeTableGraphViewCodeTemplate.tt:579-698)
    val hopInfoType = ArrayType(StructType(
      StructField("nodeType", StringType) +:
        StructField("nodeId", LongType) +:
        StructField("edgeType", StringType) +:
        ed.attrs.map(a => StructField(a.name, a.dataType))))

    val seedIds = seeds match {
      case Some(s) => s.select(col(s.columns.head).as("GlobalNodeId")).distinct()
      case None => nt.select(col("GlobalNodeId"))
    }
    val seedCols = Seq(
      col("GlobalNodeId").as("src"),
      col("GlobalNodeId").as("dst"),
      lit(0).as("hops"),
      array(col("GlobalNodeId")).as("pathNodes"),
      array().cast(edgeKeyType).as("pathEdges")) ++
      (if (display) Seq(array().cast(hopInfoType).as("pathHops")) else Nil)
    val seed = seedIds.select(seedCols: _*)

    def step(frontier: DataFrame): DataFrame = {
      // tombstone + attr predicates fold into the array before the
      // explode — dead/non-matching edges never materialize as rows
      val live = filter(col("__adj"), x =>
        attrEq.foldLeft(!array_contains(col("__del"), x.getField("edgeId"))) {
          case (acc, (k, v)) => acc && x.getField(k) === lit(v)
        })
      var df = frontier
        .join(adj, col("dst") === col("__node"))
        .withColumn("__e", explode(live))
      df = mode match {
        case EdgeDisjoint => df.filter(!array_contains(col("pathEdges"),
          struct(col("dst").as("node"), col("__e.edgeId").as("edgeId"))))
        case NodeDisjoint => df.filter(!array_contains(col("pathNodes"),
          col("__e.sink")))
      }
      val stepCols = Seq(
        col("src"),
        col("__e.sink").as("dst"),
        (col("hops") + 1).as("hops"),
        concat(col("pathNodes"), array(col("__e.sink"))).as("pathNodes"),
        concat(col("pathEdges"),
          array(struct(col("dst").as("node"), col("__e.edgeId").as("edgeId"))))
          .as("pathEdges")) ++
        (if (display) Seq(
          concat(col("pathHops"), array(struct(
            (lit(table).as("nodeType") +:
              col("dst").as("nodeId") +:
              lit(edgeName).as("edgeType") +:
              ed.attrs.map(a => col(s"__e.${a.name}").as(a.name))): _*)))
            .as("pathHops")) else Nil)
      df.select(stepCols: _*)
    }

    val results = Seq.newBuilder[DataFrame]
    if (minLen == 0) results += seed

    var frontier = seed
    if (maxLen >= 0) {
      // bounded: unroll into one declarative plan; empty hops union harmlessly
      for (k <- 1 to maxLen) {
        frontier = step(frontier)
        if (k >= minLen) results += frontier
      }
    } else {
      // unbounded *: iterate to fixpoint, truncating lineage each hop
      var k = 0
      var done = false
      while (!done) {
        frontier = step(frontier).stageBoundary
        if (frontier.isEmpty) done = true
        else {
          k += 1
          if (k >= minLen) results += frontier
          if (k >= maxIterations) throw new IllegalStateException(
            s"unbounded path expansion did not converge in $maxIterations hops")
        }
      }
    }

    val rs = results.result()
    val union = if (rs.isEmpty) seed.limit(0) else rs.reduce(_ unionAll _)
    if (!backward) union
    else union.select(
      col("dst").as("src"), col("src").as("dst"), col("hops"),
      reverse(col("pathNodes")).as("pathNodes"), col("pathEdges"))
  }

  def localKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.bitwiseAND(lit(LocalKeyMask))

  /** Render a `display=true` path row as the reference's
    * `PathMessageDecoder` JSON (`NodeTableGraphViewCodeTemplate.tt:640-698`):
    * alternating node and edge objects,
    * `[{"NodeType":"T","Id":n},{"EdgeType":"e"[,"Attribute":{...}]},…,{"NodeType":"T","Id":m}]`.
    * Built by deterministic string concatenation (as the reference does)
    * so any engine can reproduce it byte-for-byte; ids render as local
    * keys. String attrs quote; numeric/boolean attrs render via CAST.
    */
  def renderDisplay(g: GraphProvider, table: String, edgeName: String)
      : org.apache.spark.sql.Column = {
    val ed = g.schema.table(table).edge(edgeName)
    val hopJson = (h: org.apache.spark.sql.Column) => {
      val attrPart: org.apache.spark.sql.Column =
        if (ed.attrs.isEmpty) lit("")
        else concat(
          (lit(",\"Attribute\":{") +:
            ed.attrs.zipWithIndex.flatMap { case (a, i) =>
              val v = h.getField(a.name)
              val rendered = a.dataType match {
                case StringType =>
                  concat(lit("\""), v, lit("\""))
                case _ => v.cast(StringType)
              }
              Seq(lit((if (i > 0) "," else "") + s""""${a.name}":"""),
                coalesce(rendered, lit("null")))
            } :+ lit("}")): _*)
      concat(
        lit("{\"NodeType\":\""), h.getField("nodeType"),
        lit("\",\"Id\":"), localKey(h.getField("nodeId")).cast(StringType),
        lit("},{\"EdgeType\":\""), h.getField("edgeType"), lit("\""),
        attrPart, lit("},"))
    }
    concat(
      lit("["),
      concat_ws("", transform(col("pathHops"), hopJson)),
      lit("{\"NodeType\":\"" + table + "\",\"Id\":"),
      localKey(col("dst")).cast(StringType),
      lit("}]"))
  }
}
