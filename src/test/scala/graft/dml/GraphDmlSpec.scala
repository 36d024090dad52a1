package graft.dml

import graft.SparkSpec
import graft.graph.GraphBuilder
import graft.meta._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replays the reference tutorial's DML flow
  * (`GraphViewTutorial/InsAndDelTutorial.cs:14-163`): insert nodes,
  * insert edges, match, delete edge, guarded delete node.
  */
class GraphDmlSpec extends SparkSpec {

  private val td = NodeTableDef("People", 1, Some("id"), Seq("name"),
    Seq(EdgeDef("Knows", "People", "People")))
  private val ed = td.edge("Knows")

  private def freshGraph: DataFrame = {
    val s = spark
    import s.implicits._
    val people = Seq((1, "Alice"), (2, "Bob"), (3, "Caven"), (4, "David"))
      .toDF("id", "name")
    val knows = Seq((1, 2), (2, 3), (2, 4)).toDF("s", "t")
      .select(GraphBuilder.gid(1, col("s")).as("src"),
        GraphBuilder.gid(1, col("t")).as("sink"))
    GraphBuilder.nodeTable(GraphSchema(Seq(td)).table("People"),
      people, "id", Map("Knows" -> knows),
      Seq(ed -> knows))
  }

  private def outDeg(t: DataFrame, name: String): Int =
    t.filter(col("name") === name).select("KnowsOutDegree").head().getInt(0)

  test("insert edge appends with continuing edgeIds and bumps out-degree") {
    val s = spark
    import s.implicits._
    val extra = Seq((1, 3)).toDF("s", "t")
      .select(GraphBuilder.gid(1, col("s")).as("src"),
        GraphBuilder.gid(1, col("t")).as("sink"))
    val t2 = GraphDml.insertEdges(freshGraph, ed, extra)
    assert(outDeg(t2, "Alice") == 2)
    val ids = t2.filter(col("name") === "Alice")
      .select(expr("transform(Knows, x -> x.edgeId)")).head()
      .getSeq[Int](0)
    assert(ids == Seq(0, 1))
  }

  test("both-sided DML round-trip: forward and reversed views agree at every step") {
    val s = spark
    import s.implicits._
    def liveForward(t: DataFrame): Set[(Long, Long)] = t
      .select(col("GlobalNodeId").as("src"),
        explode(expr("filter(Knows, x -> NOT array_contains(KnowsDel, x.edgeId))"))
          .as("e"))
      .select(col("src"), col("e.sink"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def liveReversed(t: DataFrame): Set[(Long, Long)] = t
      .select(col("GlobalNodeId").as("dst"),
        explode(expr("filter(People_KnowsReversed, " +
          "x -> NOT array_contains(People_KnowsReversedDel, x.edgeId))")).as("e"))
      .select(col("e.sink"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def inDegSum(t: DataFrame): Long =
      t.agg(sum(col("InDegree"))).head().getLong(0)

    def gid(i: Int) = GlobalNodeId.pack(1, i.toLong)
    var t = freshGraph
    assert(liveForward(t) == liveReversed(t))

    // insert a batch (self-table edge: source rewrite then sink mirror)
    val extra = Seq((1, 3), (1, 4), (3, 1)).toDF("s", "d")
      .select(GraphBuilder.gid(1, col("s")).as("src"),
        GraphBuilder.gid(1, col("d")).as("sink"))
    val numbered = GraphDml.numberNewEdges(t, ed, extra).localCheckpoint(true)
    t = GraphDml.insertEdgesSinkSide(
      GraphDml.insertEdges(t, ed, extra).localCheckpoint(true), ed, numbered)
      .localCheckpoint(true)
    val afterInsert = liveForward(t)
    assert(afterInsert == liveReversed(t))
    assert(afterInsert == Set(
      (gid(1), gid(2)), (gid(2), gid(3)), (gid(2), gid(4)),
      (gid(1), gid(3)), (gid(1), gid(4)), (gid(3), gid(1))))
    assert(inDegSum(t) == 6)

    // delete a subset through the incremental both-sided path
    val doomed = t
      .select(col("GlobalNodeId").as("src"), explode(col("Knows")).as("e"),
        col("KnowsDel"))
      .filter(!array_contains(col("KnowsDel"), col("e.edgeId")) &&
        (col("e.sink") === gid(4) || col("GlobalNodeId") === gid(3)))
      .select(col("src"), col("e.edgeId").as("edgeId"), col("e.sink").as("sink"))
      .localCheckpoint(true)
    t = GraphDml.deleteEdgesSinkSide(
      GraphDml.deleteEdges(t, ed, doomed).localCheckpoint(true), ed, doomed)
      .localCheckpoint(true)
    val afterDelete = liveForward(t)
    assert(afterDelete == liveReversed(t))
    assert(afterDelete == Set(
      (gid(1), gid(2)), (gid(2), gid(3)), (gid(1), gid(3))))
    assert(inDegSum(t) == 3)

    // compact + resync: same live set, clean tombstones
    t = GraphDml.syncReversed(GraphDml.compact(t, ed).localCheckpoint(true),
      GraphDml.compact(t, ed).localCheckpoint(true), ed).localCheckpoint(true)
    assert(liveForward(t) == afterDelete && liveReversed(t) == afterDelete)
    assert(t.agg(sum(size(col("KnowsDel")))).head().getLong(0) == 0)
    assert(t.agg(sum(size(col("People_KnowsReversedDel")))).head().getLong(0) == 0)
  }

  test("delete edge tombstones, compaction renumbers, degrees stay live") {
    val s = spark
    import s.implicits._
    val doomed = Seq((GlobalNodeId.pack(1, 2), 0)).toDF("src", "edgeId")
    val afterDel = GraphDml.deleteEdges(freshGraph, ed, doomed)
    assert(outDeg(afterDel, "Bob") == 1)
    assert(afterDel.filter(col("name") === "Bob")
      .select(size(col("Knows"))).head().getInt(0) == 2) // array untouched
    val compacted = GraphDml.compact(afterDel, ed)
    val bob = compacted.filter(col("name") === "Bob")
    assert(bob.select(size(col("Knows"))).head().getInt(0) == 1)
    assert(bob.select(size(col("KnowsDel"))).head().getInt(0) == 0)
    val ids = bob.select(expr("transform(Knows, x -> x.edgeId)")).head().getSeq[Int](0)
    assert(ids == Seq(0)) // renumbered from 0
  }

  test("syncReversed: reversed traversal agrees with forward after delete") {
    val s = spark
    import s.implicits._
    val doomed = Seq((GlobalNodeId.pack(1, 2), 0)).toDF("src", "edgeId")
    val afterDel = GraphDml.deleteEdges(freshGraph, ed, doomed)
    // stale reversed column still carries Bob→Caven; sync drops it
    val synced = GraphDml.syncReversed(afterDel, afterDel, ed)
    val revSinks = synced
      .select(col("name"), expr("transform(People_KnowsReversed, x -> x.sink)"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(revSinks("Caven") == Set.empty)
    assert(revSinks("David") == Set(GlobalNodeId.pack(1, 2)))
    assert(revSinks("Bob") == Set(GlobalNodeId.pack(1, 1)))
  }

  test("insert node starts with empty adjacency and zero degrees") {
    val s = spark
    import s.implicits._
    val t2 = GraphDml.insertNodes(freshGraph, td,
      Seq((9, "Eve")).toDF("id", "name"), "id")
    val eve = t2.filter(col("name") === "Eve")
    assert(eve.count() == 1)
    assert(eve.select(size(col("Knows"))).head().getInt(0) == 0)
    assert(eve.select("InDegree").head().getInt(0) == 0)
    assert(eve.select("GlobalNodeId").head().getLong(0) == GlobalNodeId.pack(1, 9))
  }

  test("delete node refuses while edges remain, allows after cleanup") {
    // Bob has in+out edges → guard must throw (tutorial line 144 flow)
    intercept[IllegalStateException] {
      GraphDml.deleteNodes(freshGraph, td, col("name") === "Bob")
    }
    // a fully detached node deletes fine
    val s = spark
    import s.implicits._
    val t2 = GraphDml.insertNodes(freshGraph, td,
      Seq((9, "Eve")).toDF("id", "name"), "id")
    val t3 = GraphDml.deleteNodes(t2, td, col("name") === "Eve")
    assert(t3.filter(col("name") === "Eve").count() == 0)
  }
}
