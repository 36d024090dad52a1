package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Stage.StageOps

/** Strongly connected components (directed graphs) — the directed
  * member of the components family ([[Cc]] = undirected connectivity,
  * [[Lpa]] = communities): cycle detection in dependency/citation/link
  * graphs, the "mutual-reachability cluster" a directed near-dup or
  * plagiarism graph actually means (A copied B AND B copied A is a
  * very different relationship than one direction alone).
  *
  * Algorithm: iterative COLORING (Orzan) in DataFrame ops —
  *
  *   1. forward min-label fixpoint: `color(v)` = the smallest id that
  *      reaches v within the remaining subgraph (per-round one
  *      join + one map-combined min — the [[Cc]] shape);
  *   2. roots (`color(v) = v`) are the canonical minima of their
  *      SCCs; a backward fixpoint within each color collects exactly
  *      `{v : color(v) = c ∧ v →* c}` = SCC(c), labeled by its
  *      minimum member (the proof is two lines: a smaller member
  *      reaching c would have colored c below itself);
  *   3. extracted SCCs leave the graph; repeat on the remainder.
  *
  * Every extracted label is final and canonical (min member), so the
  * output is a pure function of the graph — an external engine
  * replays it from the transitive closure. Determinism needs no
  * tie-breaking at all: min-labels are aggregates.
  *
  * Scale honesty: each outer round peels the SCCs of all current
  * roots; a long DAG CHAIN of singleton SCCs therefore needs O(chain)
  * rounds (the known coloring weakness — same topology caveat
  * measured for GraphX in StressCc). Near-dup/link graphs (many
  * small SCCs, shallow reach) converge in a handful of rounds; for
  * adversarial diameters, bound `maxRounds` and shard upstream.
  */
object Scc {

  /** (node, component) for every node appearing in `edges`;
    * `component` = the SCC's minimum member id. Self-loops are
    * irrelevant to SCC membership and dropped. */
  def strongComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().stageBoundary
    val allNodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().stageBoundary
    var remaining = allNodes
    var eRem = e0
    var result = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("node", LongType, nullable = false),
        StructField("component", LongType, nullable = false))))
    var rounds = 0
    while (!remaining.isEmpty) {
      rounds += 1
      require(rounds <= maxRounds,
        s"SCC coloring exceeded $maxRounds peel rounds — a long chain " +
          "of singleton components; raise maxRounds or shard upstream")
      // 1. forward min fixpoint
      var color = remaining.select(col("node"), col("node").as("color"))
        .stageBoundary
      var stable = false
      while (!stable) {
        val pushed = color.join(eRem, color("node") === eRem("src"))
          .select(eRem("dst").as("node"), col("color"))
          .groupBy("node").agg(min("color").as("__nc"))
        val next = color.join(pushed, Seq("node"), "left")
          .select(col("node"),
            least(col("color"), coalesce(col("__nc"), col("color")))
              .as("color"))
          .stageBoundary
        stable = next.join(color.withColumnRenamed("color", "__old"),
          Seq("node"))
          .filter(col("color") =!= col("__old")).isEmpty
        color = next
      }
      // 2. backward collection within colors, starting at the roots
      var in = color.filter(col("node") === col("color")).stageBoundary
      var frontier = in
      while (!frontier.isEmpty) {
        val step = frontier.join(eRem, frontier("node") === eRem("dst"))
          .select(eRem("src").as("node"), col("color"))
          .distinct()
          .join(color.withColumnRenamed("color", "__c"), Seq("node"))
          .filter(col("color") === col("__c"))
          .select(col("node"), col("color"))
          .join(in, Seq("node"), "left_anti")
          .stageBoundary
        in = in.union(step).stageBoundary
        frontier = step
      }
      result = result
        .union(in.select(col("node"), col("color").as("component")))
        .stageBoundary
      // 3. peel
      remaining = remaining.join(in, Seq("node"), "left_anti").stageBoundary
      eRem = eRem
        .join(in.select(col("node").as("src")), Seq("src"), "left_anti")
        .join(in.select(col("node").as("dst")), Seq("dst"), "left_anti")
        .stageBoundary
    }
    result
  }

  /** DuckDB replay from the transitive closure: `edgeCte` must define
    * `e(src, dst)`; exposes (node, component) with component = min of
    * the mutual-reachability class. Exact for any graph the closure
    * fits — the ORACLE side may be quadratic, the engine side never
    * materializes reachability.
    */
  def oracleSqlFor(edgeCte: String): String =
    s"""WITH RECURSIVE $edgeCte,
       |ed AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
       |n AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM ed
       |  UNION
       |  SELECT r.src, ed.dst FROM reach r JOIN ed ON ed.src = r.dst),
       |mutual AS (
       |  SELECT a.src AS u, a.dst AS v FROM reach a
       |  JOIN reach b ON a.src = b.dst AND a.dst = b.src)
       |SELECT n.node,
       |  LEAST(n.node, COALESCE(MIN(m.v), n.node)) AS component
       |FROM n LEFT JOIN mutual m ON m.u = n.node
       |GROUP BY n.node""".stripMargin
}
