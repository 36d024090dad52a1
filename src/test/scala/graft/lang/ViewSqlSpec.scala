package graft.lang

import graft.SparkSpec
import graft.graph.{GraphBuilder, GraphProvider, ViewProvider}
import graft.meta._
import graft.pattern.{EdgePat, MatchPattern, MatchPlanner, NodePat}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** View DDL through the SQL dialect (`View.cs:689-903`): CREATE/DROP
  * NODE|EDGE VIEW parse into the overlay provider and MATCH plans over
  * the views with no planner special cases.
  */
class ViewSqlSpec extends SparkSpec {

  // Cat and Dog both carry a `likes` edge into Food (shared name → the
  // default edge view); Dog also `chases` Cat (single-member, no default)
  private lazy val petProvider: GraphProvider = {
    val s = spark
    import s.implicits._
    val schema = GraphSchema(Seq(
      NodeTableDef("Cat", 1, Some("id"), Seq("name"), Seq(
        EdgeDef("likes", "Cat", "Food", Seq(EdgeAttr("score", DoubleType))))),
      NodeTableDef("Dog", 2, Some("id"), Seq("dname"), Seq(
        EdgeDef("likes", "Dog", "Food", Seq(EdgeAttr("score", DoubleType))),
        EdgeDef("chases", "Dog", "Cat"))),
      NodeTableDef("Food", 3, Some("id"), Seq("fname"), Nil)))
    val cats = Seq((1, "tom"), (2, "felix")).toDF("id", "name")
    val dogs = Seq((1, "rex"), (2, "lassie")).toDF("id", "dname")
    val foods = Seq((1, "fish"), (2, "bone"), (3, "milk")).toDF("id", "fname")
    def gid(t: Int, c: String) = GraphBuilder.gid(t, col(c))
    val catLikes = Seq((1, 1, 0.9), (1, 3, 0.5), (2, 3, 0.8))
      .toDF("s", "t", "score")
      .select(gid(1, "s").as("src"), gid(3, "t").as("sink"), col("score"))
    val dogLikes = Seq((1, 2, 1.0), (2, 2, 0.7), (2, 1, 0.2))
      .toDF("s", "t", "score")
      .select(gid(2, "s").as("src"), gid(3, "t").as("sink"), col("score"))
    val chases = Seq((1, 1), (2, 2)).toDF("s", "t")
      .select(gid(2, "s").as("src"), gid(1, "t").as("sink"))
    val cat = GraphBuilder.nodeTable(schema.table("Cat"), cats, "id",
      Map("likes" -> catLikes), Seq(schema.table("Dog").edge("chases") -> chases))
    val dog = GraphBuilder.nodeTable(schema.table("Dog"), dogs, "id",
      Map("likes" -> dogLikes, "chases" -> chases), Nil)
    val food = GraphBuilder.nodeTable(schema.table("Food"), foods, "id",
      Map.empty,
      Seq(schema.table("Cat").edge("likes") -> catLikes,
        schema.table("Dog").edge("likes") -> dogLikes))
    val tables = Map("Cat" -> cat.cache(), "Dog" -> dog.cache(),
      "Food" -> food.cache())
    new GraphProvider {
      val schema: GraphSchema = petProviderSchema
      def nodeTable(name: String): DataFrame = tables(name)
    }
  }

  private lazy val petProviderSchema = GraphSchema(Seq(
    NodeTableDef("Cat", 1, Some("id"), Seq("name"), Seq(
      EdgeDef("likes", "Cat", "Food", Seq(EdgeAttr("score", DoubleType))))),
    NodeTableDef("Dog", 2, Some("id"), Seq("dname"), Seq(
      EdgeDef("likes", "Dog", "Food", Seq(EdgeAttr("score", DoubleType))),
      EdgeDef("chases", "Dog", "Cat"))),
    NodeTableDef("Food", 3, Some("id"), Seq("fname"), Nil)))

  private def newSession = new GraphSession(spark, petProvider)

  test("CREATE NODE VIEW + MATCH over the default edge view") {
    val gs = newSession
    gs.sql(
      """CREATE NODE VIEW Pet AS
        |  SELECT name AS pname FROM Cat
        |  UNION ALL
        |  SELECT dname FROM Dog""".stripMargin)
    val rows = gs.sql(
      """SELECT p._NodeType AS t, p.pname AS pname, f.fname AS fname,
        |       p_likes_f.score AS score
        |FROM Pet p, Food f
        |MATCH p-[likes]->f
        |WHERE p_likes_f.score >= 0.7
        |ORDER BY t, pname, fname""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("Cat", "felix", "milk", 0.8), ("Cat", "tom", "fish", 0.9),
      ("Dog", "lassie", "bone", 0.7), ("Dog", "rex", "bone", 1.0)))
  }

  test("edge-attr dict predicate applies through a view edge") {
    val gs = newSession
    gs.sql("CREATE NODE VIEW Pet AS SELECT name AS pname FROM Cat UNION ALL SELECT dname FROM Dog")
    val rows = gs.sql(
      """SELECT p.pname AS pname FROM Pet p, Food f
        |MATCH p-[likes {score: 1.0}]->f ORDER BY pname""".stripMargin)
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("rex"))
  }

  test("SELECT * default merge unions member columns by name") {
    val gs = newSession
    gs.sql("CREATE NODE VIEW Pet AS SELECT * FROM Cat UNION ALL SELECT * FROM Dog")
    val df = gs.sql("SELECT p._NodeType AS t, p.name AS name, p.dname AS dname FROM Pet p, Food f MATCH p-[likes]->f WHERE f.fname = 'fish' ORDER BY t")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("Cat", "tom", null), ("Dog", null, "lassie")))
  }

  test("explicit CREATE EDGE VIEW with attr mapping and NULL padding") {
    val gs = newSession
    gs.sql("CREATE NODE VIEW Pet AS SELECT name AS pname FROM Cat UNION ALL SELECT dname FROM Dog")
    gs.sql(
      """CREATE EDGE VIEW Pet.eats AS
        |  SELECT score AS strength, NULL AS barky FROM Cat.likes
        |  UNION ALL
        |  SELECT score, NULL FROM Dog.likes""".stripMargin)
    val rows = gs.sql(
      """SELECT p.pname AS pname, f.fname AS fname,
        |       p_eats_f.strength AS strength, p_eats_f.barky AS barky
        |FROM Pet p, Food f MATCH p-[eats]->f
        |WHERE p_eats_f.strength > 0.85 ORDER BY pname""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.isNullAt(3)))
    assert(rows.toSeq == Seq(("rex", "bone", 1.0, true), ("tom", "fish", 0.9, true)))
  }

  test("DROP NODE VIEW removes the view and its edge views; re-create works") {
    val gs = newSession
    gs.sql("CREATE NODE VIEW Pet AS SELECT name AS pname FROM Cat UNION ALL SELECT dname FROM Dog")
    assert(gs.sql("SELECT p.pname AS x FROM Pet p, Food f MATCH p-[likes]->f").count() == 6)
    gs.sql("DROP NODE VIEW Pet")
    intercept[Exception] {
      gs.sql("SELECT p.pname AS x FROM Pet p, Food f MATCH p-[likes]->f").collect()
    }
    // re-create with a different mapping — the old definition must not leak
    gs.sql("CREATE NODE VIEW Pet AS SELECT name AS petname FROM Cat")
    val n = gs.sql("SELECT p.petname AS x FROM Pet p").count()
    assert(n == 2)
  }

  test("DROP EDGE VIEW removes just that edge view") {
    val gs = newSession
    gs.sql("CREATE NODE VIEW Pet AS SELECT name AS pname FROM Cat UNION ALL SELECT dname FROM Dog")
    gs.sql("DROP EDGE VIEW Pet.likes")
    intercept[Exception] {
      gs.sql("SELECT p.pname AS x FROM Pet p, Food f MATCH p-[likes]->f").collect()
    }
    // node view itself still queryable
    assert(gs.sql("SELECT p.pname AS x FROM Pet p").count() == 4)
  }

  test("reversed traversal over a view edge unions the member mirrors") {
    val vp = ViewProvider(petProvider,
      Seq(graft.graph.NodeViewDef("Pet", Seq("Cat", "Dog"),
        Seq("pname" -> Map("Cat" -> "name", "Dog" -> "dname")))),
      Seq(graft.graph.EdgeViewDef("likes", "Pet", "Food",
        Seq(("Cat", "likes"), ("Dog", "likes")),
        Seq("score" -> Map(("Cat", "likes") -> "score", ("Dog", "likes") -> "score")))))
    // start from Food so the greedy planner walks the REVERSED mirror
    val df = MatchPlanner.plan(vp, MatchPattern(
      Seq(NodePat("f", "Food"), NodePat("p", "Pet")),
      Seq(EdgePat("p", "likes", "f"))))
    val rows = df.select(col("f__fname"), col("p__pname"), col("p_likes_f__score"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sorted
    assert(rows.toSeq == Seq(
      ("bone", "lassie", 0.7), ("bone", "rex", 1.0), ("fish", "lassie", 0.2),
      ("fish", "tom", 0.9), ("milk", "felix", 0.8), ("milk", "tom", 0.5)))
  }

  test("multi-sink edge view resolves its sink to a covering node view") {
    val gs = newSession
    // chases sinks to Cat, likes sinks to Food → need a covering view
    intercept[IllegalArgumentException] {
      gs.sql(
        """CREATE EDGE VIEW Thing.acts AS
          |  SELECT NULL AS pad FROM Dog.chases
          |  UNION ALL SELECT NULL FROM Dog.likes""".stripMargin)
    }
    gs.sql("CREATE NODE VIEW Thing AS SELECT dname AS label FROM Dog")
    gs.sql("CREATE NODE VIEW Target AS SELECT name AS label FROM Cat UNION ALL SELECT fname FROM Food")
    gs.sql(
      """CREATE EDGE VIEW Thing.acts AS
        |  SELECT NULL AS pad FROM Dog.chases
        |  UNION ALL SELECT NULL FROM Dog.likes""".stripMargin)
    val rows = gs.sql(
      """SELECT x.label AS actor, y._NodeType AS kind, y.label AS target
        |FROM Thing x, Target y MATCH x-[acts]->y
        |ORDER BY actor, kind, target""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("lassie", "Cat", "felix"), ("lassie", "Food", "bone"),
      ("lassie", "Food", "fish"),
      ("rex", "Cat", "tom"), ("rex", "Food", "bone")))
  }

  // ---- var-length paths over views: Town carries TWO edges (road →
  // Town, rail → City); Place = Town ∪ City and Place.link = road ∪ rail
  // sinks to {Town, City} → resolves to Place itself — the self-sink
  // edge view the reference's per-EDGE-VIEW bfsPath generator covers
  // (EdgeViewBfsScriptTemplate.tt:22-115).

  private lazy val townSchema = GraphSchema(Seq(
    NodeTableDef("Town", 1, Some("id"), Seq("tname"), Seq(
      EdgeDef("road", "Town", "Town"),
      EdgeDef("rail", "Town", "City"))),
    NodeTableDef("City", 2, Some("id"), Seq("cname"), Nil)))

  private lazy val townProvider: GraphProvider = {
    val s = spark
    import s.implicits._
    def gid(t: Int, c: String) = GraphBuilder.gid(t, col(c))
    val towns = Seq((1, "t1"), (2, "t2"), (3, "t3")).toDF("id", "tname")
    val cities = Seq((1, "c1"), (2, "c2")).toDF("id", "cname")
    val roads = Seq((1, 2), (2, 3), (3, 1)).toDF("s", "t")
      .select(gid(1, "s").as("src"), gid(1, "t").as("sink"))
    val rails = Seq((1, 1), (3, 2)).toDF("s", "t")
      .select(gid(1, "s").as("src"), gid(2, "t").as("sink"))
    val town = GraphBuilder.nodeTable(townSchema.table("Town"), towns, "id",
      Map("road" -> roads, "rail" -> rails),
      Seq(townSchema.table("Town").edge("road") -> roads))
    val city = GraphBuilder.nodeTable(townSchema.table("City"), cities, "id",
      Map.empty, Seq(townSchema.table("Town").edge("rail") -> rails))
    val tables = Map("Town" -> town.cache(), "City" -> city.cache())
    new GraphProvider {
      val schema: GraphSchema = townSchema
      def nodeTable(name: String): DataFrame = tables(name)
    }
  }

  private val townEdges = Seq(
    (0, "t1", "t2"), (1, "t2", "t3"), (2, "t3", "t1"),
    (3, "t1", "c1"), (4, "t3", "c2"))

  /** reference walk: exhaustive driver-side path enumeration over the
    * 5-edge graph — the ground truth the distributed expansion must match
    */
  private def refWalk(minLen: Int, maxLen: Int,
      nodeDisjoint: Boolean): Seq[(String, String, Int)] = {
    val out = scala.collection.mutable.Buffer[(String, String, Int)]()
    def rec(start: String, cur: String, used: Set[Int],
        visited: Set[String], hops: Int): Unit = {
      if (hops > 0 && hops >= minLen) out += ((start, cur, hops))
      if (maxLen >= 0 && hops >= maxLen) return
      townEdges.foreach { case (eid, s, t) =>
        if (s == cur && !used(eid) && (!nodeDisjoint || !visited(t)))
          rec(start, t, used + eid, visited + t, hops + 1)
      }
    }
    val nodes = Seq("t1", "t2", "t3", "c1", "c2")
    if (minLen == 0) nodes.foreach(n => out += ((n, n, 0)))
    nodes.foreach(n => rec(n, n, Set.empty, Set(n), 0))
    out.toSeq
  }

  private def townViews(gs: GraphSession): Unit = {
    gs.sql("""CREATE NODE VIEW Place AS
             |  SELECT tname AS label FROM Town
             |  UNION ALL SELECT cname FROM City""".stripMargin)
    gs.sql("""CREATE EDGE VIEW Place.link AS
             |  SELECT NULL FROM Town.road
             |  UNION ALL SELECT NULL FROM Town.rail""".stripMargin)
  }

  private lazy val townOverlay = ViewProvider(townProvider,
    Seq(graft.graph.NodeViewDef("Place", Seq("Town", "City"),
      Seq("label" -> Map("Town" -> "tname", "City" -> "cname")))),
    Seq(graft.graph.EdgeViewDef("link", "Place", "Place",
      Seq(("Town", "road"), ("Town", "rail")), Nil)))

  test("edge view unions MULTIPLE member edges from the same table with " +
    "collision-free edgeIds") {
    val pl = townOverlay.nodeTable("Place")
    val adj = pl.select(col("label"), col("link")).collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getInt(1))).toMap
    // t1: road→t2 + rail→c1; t2: road→t3; t3: road→t1 + rail→c2
    assert(adj("t1").size == 2 && adj("t2").size == 1 && adj("t3").size == 2)
    assert(adj("c1").isEmpty && adj("c2").isEmpty)
    // remapped ids are unique within each holder's adjacency
    adj.values.foreach(ids => assert(ids.distinct.size == ids.size))
  }

  test("var-length MATCH over a self-sink edge view through the dialect") {
    val gs = new GraphSession(spark, townProvider)
    townViews(gs)
    val got = gs.sql(
      """SELECT x_link_y.hops AS hops, x.label AS src, y.label AS dst
        |FROM Place x, Place y
        |MATCH x-[link*1..2]->y
        |ORDER BY hops, src, dst""".stripMargin)
      .collect().map(r => (r.getString(1), r.getString(2), r.getInt(0)))
    assert(got.sorted.toSeq == refWalk(1, 2, nodeDisjoint = false).sorted)
  }

  test("unbounded fixpoint over a view equals the exhaustive walk") {
    val gs = new GraphSession(spark, townProvider)
    townViews(gs)
    val got = gs.sql(
      """SELECT x_link_y.hops AS hops, x.label AS src, y.label AS dst
        |FROM Place x, Place y
        |MATCH x-[link*]->y""".stripMargin)
      .collect().map(r => (r.getString(1), r.getString(2), r.getInt(0)))
    assert(got.sorted.toSeq == refWalk(0, -1, nodeDisjoint = false).sorted)
  }

  test("node-disjoint var-length expansion over a view") {
    val labels = townOverlay.nodeTable("Place")
      .select(col("GlobalNodeId"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.paths.PathExpand
      .expand(townOverlay, "Place", "link", 1, 3, graft.paths.PathExpand.NodeDisjoint)
      .collect().map(r => (labels(r.getLong(0)), labels(r.getLong(1)), r.getInt(2)))
    assert(got.sorted.toSeq == refWalk(1, 3, nodeDisjoint = true).sorted)
  }

  test("backward var-length expansion over a view walks the remapped " +
    "mirrors to the same path set") {
    val labels = townOverlay.nodeTable("Place")
      .select(col("GlobalNodeId"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.paths.PathExpand
      .expand(townOverlay, "Place", "link", 1, 2,
        graft.paths.PathExpand.EdgeDisjoint, backward = true)
      .collect().map(r => (labels(r.getLong(0)), labels(r.getLong(1)), r.getInt(2)))
    assert(got.sorted.toSeq == refWalk(1, 2, nodeDisjoint = false).sorted)
  }

  test("correlated [NOT] EXISTS composes with a view var-length pattern") {
    val gs = new GraphSession(spark, townProvider)
    townViews(gs)
    def q(neg: String): Seq[String] = gs.sql(
      s"""SELECT x.label AS src FROM Place x
         |WHERE $neg EXISTS (SELECT 1 FROM Place y
         |  MATCH x-[link*1..2]->y WHERE y.label = 'c2')
         |ORDER BY src""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    // reaches c2 within 1..2 hops: t3 (rail), t2 (road then rail)
    assert(q("") == Seq("t2", "t3"))
    assert(q("NOT") == Seq("c1", "c2", "t1"))
  }

  test("SELECT p.* over a view var-length path renders PathMessage JSON") {
    val gs = new GraphSession(spark, townProvider)
    townViews(gs)
    val rows = gs.sql(
      """SELECT x.label AS src, y.label AS dst, p.*
        |FROM Place x, Place y
        |MATCH x-[link*1..2 AS p]->y
        |ORDER BY src, dst, p""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 10)
    // alternating node/edge objects with per-table local ids, the view
    // name as the NodeType (the view's bfs surface, as the reference's
    // per-edge-view generated function)
    assert(rows.contains(("t1", "c1",
      """[{"NodeType":"Place","Id":1},{"EdgeType":"link"},{"NodeType":"Place","Id":1}]""")))
    assert(rows.contains(("t1", "t3",
      """[{"NodeType":"Place","Id":1},{"EdgeType":"link"},{"NodeType":"Place","Id":2},{"EdgeType":"link"},{"NodeType":"Place","Id":3}]""")))
  }

  test("GlobalNodeView is queryable and matchable through the dialect") {
    val gs = newSession
    // plain SQL over the implicit schema-wide view
    val counts = gs.sql(
      """SELECT g._NodeType AS t, COUNT(*) AS cnt FROM GlobalNodeView g
        |GROUP BY g._NodeType ORDER BY t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(counts.toSeq == Seq(("Cat", 2L), ("Dog", 2L), ("Food", 3L)))
    // an edge view may attach to it (the implicit view stays DERIVED
    // from the live schema — never frozen into the registry) — and
    // then it is a MATCH endpoint
    gs.sql(
      """CREATE EDGE VIEW GlobalNodeView.locs AS
        |  SELECT NULL FROM Cat.likes
        |  UNION ALL SELECT NULL FROM Dog.likes""".stripMargin)
    val rows = gs.sql(
      """SELECT g._NodeType AS t, f.fname AS fname
        |FROM GlobalNodeView g, Food f
        |MATCH g-[locs]->f
        |ORDER BY t, fname""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("Cat", "fish"), ("Cat", "milk"),
      ("Cat", "milk"), ("Dog", "bone"), ("Dog", "bone"), ("Dog", "fish")))
  }

  test("name collisions and unknown members are rejected") {
    val gs = newSession
    intercept[IllegalArgumentException] {
      gs.sql("CREATE NODE VIEW Cat AS SELECT name AS n FROM Cat")
    }
    intercept[IllegalArgumentException] {
      gs.sql("CREATE NODE VIEW V AS SELECT zzz AS n FROM NoSuchTable")
    }
    gs.sql("CREATE NODE VIEW V AS SELECT name AS n FROM Cat")
    intercept[IllegalArgumentException] {
      gs.sql("CREATE NODE VIEW V AS SELECT name AS n FROM Cat")
    }
  }

  test("SHOW NODE VIEWS / EDGE VIEWS / PROCS reflect the registries, " +
    "including the implicit GlobalNodeView and default edge views") {
    val gs = newSession
    gs.sql("CREATE NODE VIEW Pet AS SELECT name AS pname FROM Cat " +
      "UNION ALL SELECT dname FROM Dog")
    val nv = gs.sql("SHOW NODE VIEWS").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(nv("Pet")._2 == "explicit")
    assert(nv("Pet")._1.contains("Cat") && nv("Pet")._1.contains("Dog"))
    assert(nv(graft.lang.GraphSession.GlobalViewName)._2 == "implicit")

    val ev = gs.sql("SHOW EDGE VIEWS").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // Cat and Dog both carry `likes`, so node-view creation attached
    // the default edge view of the same name
    assert(ev.contains(("Pet", "likes")), ev.mkString(","))

    gs.sql("CREATE PROC CountCats AS BEGIN SELECT COUNT(*) AS c FROM Cat END")
    val procs = gs.sql("SHOW PROCS").collect().map(_.getString(0)).toSet
    assert(procs.contains("countcats"), procs.toString)
  }
}
