package graft.lang

import graft.SparkSpec
import graft.graph.{GraphBuilder, GraphProvider}
import graft.meta._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial lexical cases for the dialect's text passes: keywords
  * inside string literals (with backslash and doubled-quote escapes),
  * comments carrying keywords, nested parens — the bug class the
  * shared [[SqlLex]] scanner retires.
  */
class SqlLexSpec extends SparkSpec {

  test("segments round-trip and classify escapes correctly") {
    val sql = raw"SELECT 'it\'s a ''test''' AS x, `a b` FROM t -- c 'd\nWHERE /* e /* f */ g */ 1=1"
    assert(SqlLex.segments(sql).map(_.text).mkString == sql)
    val lits = SqlLex.segments(sql).filter(_.kind == SqlLex.Lit).map(_.text)
    assert(lits == Vector(raw"'it\'s a ''test'''", "`a b`"))
    val comments = SqlLex.segments(sql).filter(_.kind == SqlLex.Comment)
    assert(comments.map(_.text) ==
      Vector("-- c 'd\\nWHERE /* e /* f */ g */ 1=1"))
  }

  test("nested block comments close correctly") {
    val sql = "a /* x /* y */ z */ b"
    assert(SqlLex.segments(sql).collect {
      case SqlLex.Seg(SqlLex.Code, t) => t
    }.mkString == "a  b")
  }

  test("OFFSET/FETCH inside literals and comments survives rewriting") {
    // the ADVICE case: a backslash-escaped quote must not end the literal
    val q1 = raw"SELECT * FROM t WHERE a = 'it\'s OFFSET 5 ROWS FETCH NEXT 3 ROWS ONLY' OFFSET 1 ROWS"
    val r1 = GraphSql.rewriteOffsetFetch(q1)
    assert(r1.contains(raw"'it\'s OFFSET 5 ROWS FETCH NEXT 3 ROWS ONLY'"))
    assert(r1.endsWith("OFFSET 1"))
    // doubled-quote escape
    val q2 = "SELECT 1 WHERE b = 'don''t OFFSET 2 ROWS'"
    assert(GraphSql.rewriteOffsetFetch(q2) == q2)
    // keyword only inside a comment → no rewrite wanted, text preserved
    val q3 = "SELECT 1 -- OFFSET 9 ROWS\nFROM t"
    assert(GraphSql.rewriteOffsetFetch(q3) == q3)
    assert(!GraphSql.hasOffsetFetch(q3))
  }

  test("top-level AND splitting skips literals, comments and parens") {
    assert(SqlLex.splitTopLevelAnd(
      "a = 'x AND y' AND (b AND c) AND d -- AND e") ==
      Seq("a = 'x AND y'", "(b AND c)", "d -- AND e"))
    assert(SqlLex.splitTopLevelAnd("band = 1 AND android > 2") ==
      Seq("band = 1", "android > 2"))
  }

  test("statement splitting ignores ';' in literals and comments") {
    val script = "SELECT 'a;b' AS x; SELECT 2 -- c;d\n; SELECT 3"
    assert(SqlLex.splitTopLevel(script, ';').size == 3)
  }

  test("rewriteRefs leaves literals and comments untouched") {
    assert(GraphSql.rewriteRefs("a.k = 'a.k' -- a.k\n AND a.v > 1", Seq("a")) ==
      "a__k = 'a.k' -- a.k\n AND a__v > 1")
  }

  test("EXISTS inside a string literal is not a correlated subquery") {
    val sql = "SELECT c.name FROM People c WHERE c.name = 'EXISTS (SELECT MATCH x)'"
    assert(GraphSql.findExistsMatch(sql).isEmpty)
  }

  test("pattern attr dict values may contain commas inside quotes") {
    val hops = GraphSql.parsePattern("a-[e {k: 'x, y', w: 2}]->b")
    assert(hops.head.attrEq == Map("k" -> "x, y", "w" -> 2L))
  }

  test("MATCH inside a literal or comment does not make a MATCH query") {
    assert(!GraphSql.isMatchQuery(
      "SELECT x FROM t WHERE note = 'a MATCH b'"))
    assert(!GraphSql.isMatchQuery(
      "SELECT x FROM t -- MATCH a-[e]->b\nWHERE x > 1"))
    assert(GraphSql.isMatchQuery(
      "SELECT a.x FROM T a, T b MATCH a-[e]->b"))
    // a plain statement with MATCH in a literal flows through to Spark
    val gs = new GraphSession(spark, peopleProvider)
    val n = gs.sql(
      "SELECT x FROM (VALUES (1)) t(x) WHERE 'a MATCH b' = 'a MATCH b'")
      .count()
    assert(n == 1)
  }

  test("adversarial literals flow through a full MATCH statement") {
    val gs = new GraphSession(spark, peopleProvider)
    val res = gs.sql(
      """SELECT A.name AS n FROM People A, People B
        |MATCH A-[Knows]->B
        |WHERE B.name = 'David' AND A.name <> 'x AND y OFFSET 1 ROWS; --'
        |ORDER BY n""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(res == Seq("Bob"))
  }

  private lazy val peopleProvider: GraphProvider = {
    val s = spark
    import s.implicits._
    val schema = GraphSchema(Seq(
      NodeTableDef("People", 1, Some("id"), Seq("name"), Seq(
        EdgeDef("Knows", "People", "People")))))
    val people = Seq((1, "Alice"), (2, "Bob"), (3, "Caven"), (4, "David"))
      .toDF("id", "name")
    val knows = Seq((1, 2), (2, 3), (2, 4)).toDF("s", "t")
      .select(GraphBuilder.gid(1, col("s")).as("src"),
        GraphBuilder.gid(1, col("t")).as("sink"))
    val table = GraphBuilder.nodeTable(schema.table("People"), people, "id",
      Map("Knows" -> knows), Seq(schema.table("People").edge("Knows") -> knows))
      .cache()
    new GraphProvider {
      val schema: GraphSchema = GraphSchema(Seq(
        NodeTableDef("People", 1, Some("id"), Seq("name"), Seq(
          EdgeDef("Knows", "People", "People")))))
      def nodeTable(name: String): DataFrame = table
    }
  }
}
