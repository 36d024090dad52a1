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
}
