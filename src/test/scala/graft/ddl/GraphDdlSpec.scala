package graft.ddl

import graft.SparkSpec
import graft.lang.GraphSession
import graft.load.BulkLoad
import org.apache.spark.sql.types._

import java.nio.file.Files

/** End-to-end DDL → bulk load → MATCH over a persistent catalog,
  * replaying the reference's BulkLoadTutorial (Reader/Book/Reads,
  * `GraphViewTutorial/BulkLoadTutorial.cs:44-100`).
  */
class GraphDdlSpec extends SparkSpec {

  test("DDL grammar parses roles, types, edges") {
    val (td, props) = GraphDdl.parseCreateNodeTable(
      """CREATE NODE TABLE People (
        |  id INT NODEID,
        |  name STRING,
        |  EDGE Knows TO People (weight DOUBLE, kind STRING)
        |)""".stripMargin, tableId = 7)
    assert(td.name == "People" && td.tableId == 7)
    assert(td.nodeIdColumn.contains("id"))
    assert(td.propertyColumns == Seq("name"))
    assert(td.edges.head.name == "Knows" && td.edges.head.sinkTable == "People")
    assert(td.edges.head.attrs.map(_.name) == Seq("weight", "kind"))
    assert(props == StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType))))
  }

  test("catalog round-trip: create, bulk load, match, reload") {
    val dir = Files.createTempDirectory("graft_cat").toString
    val cat = new GraphCatalog(spark, dir)

    def create(sql: String): Unit = {
      val (td, props) = GraphDdl.parseCreateNodeTable(sql, cat.nextTableId)
      cat.createNodeTable(td, props)
    }
    create("CREATE NODE TABLE Book (name STRING NODEID)")
    create("""CREATE NODE TABLE Reader (
             |  name STRING NODEID, gender STRING,
             |  EDGE Reads TO Book)""".stripMargin)

    val bookCsv = Files.createTempFile("books", ".csv")
    Files.writeString(bookCsv, "name\nbook_1\nbook_2\nbook_3\n")
    val readerCsv = Files.createTempFile("readers", ".csv")
    Files.writeString(readerCsv, "name,gender\nalice,f\nbob,m\n")
    val readsCsv = Files.createTempFile("reads", ".csv")
    Files.writeString(readsCsv,
      "reader,book\nalice,book_1\nalice,book_2\nbob,book_2\n")

    BulkLoad.bulkInsertNode(cat, "Book", bookCsv.toString)
    BulkLoad.bulkInsertNode(cat, "Reader", readerCsv.toString)
    BulkLoad.bulkInsertEdge(cat, "Reader", "Reads", readsCsv.toString)

    // the tutorial's 1-hop MATCH (BulkLoadTutorial.cs:92-97)
    def aliceBooks(c: GraphCatalog): Seq[String] =
      new GraphSession(spark, c.provider).sql(
        """SELECT b.name FROM Reader r, Book b MATCH r-[Reads]->b
          |WHERE r.name = 'alice' ORDER BY b.name""".stripMargin)
        .collect().map(_.getString(0)).toSeq
    assert(aliceBooks(cat) == Seq("book_1", "book_2"))

    // degrees maintained through the load
    val book2InDeg = cat.provider.nodeTable("Book")
      .filter(org.apache.spark.sql.functions.col("name") === "book_2")
      .select("InDegree").head().getInt(0)
    assert(book2InDeg == 2)

    // a fresh catalog instance over the same dir sees everything
    val reloaded = new GraphCatalog(spark, dir)
    assert(reloaded.schema.tables.map(_.name).toSet == Set("Book", "Reader"))
    assert(aliceBooks(reloaded) == Seq("book_1", "book_2"))
  }

  test("bulk load over a self-referencing edge keeps both sides in sync") {
    val dir = Files.createTempDirectory("graft_self").toString
    val cat = new GraphCatalog(spark, dir)
    val (td, props) = GraphDdl.parseCreateNodeTable(
      """CREATE NODE TABLE People (
        |  id INT NODEID, name STRING, EDGE Knows TO People)""".stripMargin,
      cat.nextTableId)
    cat.createNodeTable(td, props)

    val nodes = Files.createTempFile("people", ".csv")
    Files.writeString(nodes, "id,name\n1,Alice\n2,Bob\n3,Caven\n4,David\n")
    val edges = Files.createTempFile("knows", ".csv")
    Files.writeString(edges, "src_id,dst_id\n1,2\n2,3\n2,4\n")
    BulkLoad.bulkInsertNode(cat, "People", nodes.toString)
    BulkLoad.bulkInsertEdge(cat, "People", "Knows", edges.toString)

    val t = cat.provider.nodeTable("People")
    val byName = t.select("name", "InDegree", "KnowsOutDegree")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(byName("Bob") == ((1, 2)))
    assert(byName("Alice") == ((0, 1)))
    // reversed mirror landed on the same (self) table
    val revBob = t.filter(org.apache.spark.sql.functions.col("name") === "Caven")
      .select(org.apache.spark.sql.functions.expr(
        "transform(People_KnowsReversed, x -> x.sink)"))
      .head().getSeq[Long](0)
    assert(revBob.nonEmpty) // Caven's reversed edge points back at Bob
  }

  /** Full SQL-driven replay of the reference's InsAndDelTutorial
    * (`GraphViewTutorial/InsAndDelTutorial.cs:14-163`): DDL → INSERT
    * NODE → INSERT EDGE → 2-hop MATCH → DELETE EDGE → empty MATCH →
    * guarded DELETE NODE → cleanup.
    */
  test("InsAndDelTutorial flow through SQL statements") {
    val dir = Files.createTempDirectory("graft_tut").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))

    gs.sql("""CREATE NODE TABLE People (
             |  id INT NODEID, name STRING,
             |  EDGE Knows TO People)""".stripMargin)
    assert(gs.sql(
      """INSERT NODE INTO People
        |SELECT * FROM VALUES (1,'Alice'),(2,'Bob'),(3,'Caven'),(4,'David')
        |  AS t(id, name)""".stripMargin)
      .head().getLong(0) == 4)
    assert(gs.sql(
      """INSERT EDGE INTO People.Knows
        |SELECT * FROM VALUES (1,2),(2,3),(2,4) AS t(src_id, dst_id)""".stripMargin)
      .head().getLong(0) == 3)

    def twoHop(): Seq[String] = gs.sql(
      """SELECT C.name FROM People A, People B, People C
        |MATCH A-[Knows]->B-[Knows]->C
        |WHERE A.name = 'Alice' ORDER BY C.name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(twoHop() == Seq("Caven", "David"))

    // DELETE EDGE Bob->Caven; the tutorial expects the 2-hop to shrink
    assert(gs.sql(
      """DELETE EDGE x-[Knows]->y FROM People x, People y
        |WHERE x.name = 'Bob' AND y.name = 'Caven'""".stripMargin)
      .head().getLong(0) == 1)
    assert(twoHop() == Seq("David"))

    // compaction (MergeAllDeleteColumn analogue): same results, clean
    // tombstones
    gs.catalog.get.compactAll()
    assert(twoHop() == Seq("David"))
    val delSizes = gs.catalog.get.provider.nodeTable("People")
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("KnowsDel")))
      .collect().map(_.getInt(0)).toSet
    assert(delSizes == Set(0))

    // guarded DELETE NODE: Bob still has edges → must throw
    intercept[IllegalStateException] {
      gs.sql("DELETE NODE FROM People WHERE name = 'Bob'")
    }
    // Caven now has no edges (its incoming edge was deleted)
    assert(gs.sql("DELETE NODE FROM People WHERE name = 'Caven'")
      .head().getLong(0) == 1)
    assert(gs.sql(
      """SELECT p.name FROM People p MATCH p-[Knows]->p
        |WHERE 1 = 0""".stripMargin).count() == 0) // parser smoke
  }

  /** Bucketed catalog: tables persist bucketBy(GlobalNodeId), DML
    * rewrites keep the layout, a frontier join on GlobalNodeId plans
    * with no shuffle exchange on the table side, and a reloaded catalog
    * keeps the bucket spec from the meta.
    */
  test("bucketed catalog: co-located joins survive DML and reload") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_bkt").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir, Some(4)))
    gs.sql("""CREATE NODE TABLE People (
             |  id INT NODEID, name STRING, EDGE Knows TO People)""".stripMargin)
    gs.sql("""INSERT NODE INTO People
             |SELECT * FROM VALUES (1,'Alice'),(2,'Bob'),(3,'Caven') AS t(id, name)""".stripMargin)
    gs.sql("""INSERT EDGE INTO People.Knows
             |SELECT * FROM VALUES (1,2),(2,3) AS t(s, d)""".stripMargin)

    val t = gs.catalog.get.provider.nodeTable("People")
    // co-location: a frontier join on GlobalNodeId must not exchange
    // the bucketed table side even with broadcast disabled
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val s2 = spark
      import s2.implicits._
      val frontier = Seq((1L << 48 | 1L), (1L << 48 | 2L)).toDF("GlobalNodeId")
        .repartition(4, col("GlobalNodeId"))
      val joined = frontier.join(t, "GlobalNodeId")
      val planStr = joined.queryExecution.executedPlan.toString
      // exactly one side (the frontier repartition) may exchange; the
      // scan side must not re-shuffle
      assert(planStr.contains("SelectedBucketsCount") ||
        planStr.split("Exchange").length - 1 <= 1, planStr)
      assert(joined.count() == 2)
    } finally spark.conf.set(key, saved)

    // the graph is still correct through the bucketed layout
    val res = gs.sql(
      """SELECT B.name FROM People A, People B MATCH A-[Knows]->B
        |WHERE A.name = 'Alice' ORDER BY B.name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(res == Seq("Bob"))

    // reload: bucket spec comes back from the meta
    val reloaded = new GraphCatalog(spark, dir)
    assert(reloaded.buckets.contains(4))
    val gs2 = new GraphSession(spark, reloaded)
    val res2 = gs2.sql(
      """SELECT B.name FROM People A, People B MATCH A-[Knows]->B
        |WHERE A.name = 'Bob' ORDER BY B.name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(res2 == Seq("Caven"))

    // admin teardown through the BUCKETED paths: TRUNCATE DATA zeroes
    // rows via the bucketed rewrite swap (layout survives), CLEAR DATA
    // drops the tables AND their session-catalog registrations keeping
    // the bucket spec in the surviving meta, DROP GRAPH drops the meta
    // too, and the fresh catalog keeps the bucket spec for new tables
    gs2.sql("TRUNCATE DATA")
    assert(gs2.sql("SELECT COUNT(*) AS n FROM People").head().getLong(0) == 0L)
    gs2.sql("""INSERT NODE INTO People
              |SELECT * FROM VALUES (7,'Grace') AS t(id, name)""".stripMargin)
    assert(gs2.sql("SELECT name FROM People").head().getString(0) == "Grace")
    gs2.sql("CLEAR DATA")
    assert(gs2.sql("SHOW NODE TABLES").count() == 0L)
    gs2.sql("CREATE NODE TABLE People (id INT NODEID, name STRING)")
    gs2.sql("""INSERT NODE INTO People
              |SELECT * FROM VALUES (8,'Heidi') AS t(id, name)""".stripMargin)
    assert(gs2.sql("SELECT name FROM People").head().getString(0) == "Heidi")
    gs2.sql("DROP GRAPH DATABASE")
    assert(gs2.sql("SHOW NODE TABLES").count() == 0L)
    gs2.sql("CREATE NODE TABLE Crew (id INT NODEID, name STRING)")
    gs2.sql("""INSERT NODE INTO Crew
              |SELECT * FROM VALUES (1,'Hopper') AS t(id, name)""".stripMargin)
    assert(gs2.sql("SELECT COUNT(*) AS n FROM Crew").head().getLong(0) == 1L)
  }

  /** Replay of the reference's StoredProcedureTutorial
    * (`GraphViewTutorial/StoredProcedureTutorial.cs:17-100`): typed
    * params, BEGIN/END bodies, EXEC with positional args.
    */
  test("stored procedures: CREATE PROC / EXEC / DROP tutorial flow") {
    val dir = Files.createTempDirectory("graft_proc").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE NODE TABLE Node (id INT NODEID, EDGE Edges TO Node)")
    gs.sql("INSERT NODE INTO Node SELECT * FROM VALUES (1),(2),(3) AS t(id)")
    gs.sql("""CREATE PROCEDURE AddEdge @st INT, @ed INT AS BEGIN
             |  INSERT EDGE INTO Node.Edges
             |  SELECT s.id, t.id FROM Node s, Node t
             |  WHERE s.id = @st AND t.id = @ed
             |END""".stripMargin)
    gs.sql("""CREATE PROCEDURE SelectNeighbors @id INT AS BEGIN
             |  SELECT y.id FROM Node x, Node y MATCH x-[Edges]->y
             |  WHERE x.id = @id ORDER BY y.id
             |END""".stripMargin)
    assert(gs.sql("EXEC AddEdge 1, 2").head().getLong(0) == 1)
    assert(gs.sql("EXEC AddEdge 1, 3").head().getLong(0) == 1)
    val res = gs.sql("EXEC SelectNeighbors 1")
      .collect().map(_.getInt(0)).toSeq
    assert(res == Seq(2, 3))
    // wrong arity is rejected; dropped procs stop resolving
    intercept[IllegalArgumentException] { gs.sql("EXEC AddEdge 1") }
    gs.sql("DROP PROCEDURE AddEdge")
    intercept[Exception] { gs.sql("EXEC AddEdge 2, 3").collect() }

    // procs persist in the catalog meta (the reference's
    // _StoredProcedureCollection): a FRESH catalog + session still
    // EXECs the surviving proc, and the drop persisted too
    val gs2 = new GraphSession(spark, new GraphCatalog(spark, dir))
    assert(gs2.sql("EXEC SelectNeighbors 1")
      .collect().map(_.getInt(0)).toSeq == Seq(2, 3))
    intercept[Exception] { gs2.sql("EXEC AddEdge 2, 3").collect() }
  }

  /** Views persist in the catalog meta (the reference's
    * _NodeViewColumnCollection rows, `View.cs:560-618`) — a reloaded
    * catalog serves the same MATCH-able views; drops persist too.
    */
  test("views persist in the catalog and survive reload") {
    val dir = Files.createTempDirectory("graft_views").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE NODE TABLE Food (id INT NODEID, fname VARCHAR(20))")
    gs.sql("CREATE NODE TABLE Cat (id INT NODEID, cname VARCHAR(20), EDGE likes TO Food)")
    gs.sql("CREATE NODE TABLE Dog (id INT NODEID, dname VARCHAR(20), EDGE likes TO Food)")
    gs.sql("INSERT NODE INTO Food SELECT * FROM VALUES (1,'fish'),(2,'bone') AS t(id,fname)")
    gs.sql("INSERT NODE INTO Cat SELECT * FROM VALUES (1,'tom') AS t(id,cname)")
    gs.sql("INSERT NODE INTO Dog SELECT * FROM VALUES (1,'rex') AS t(id,dname)")
    gs.sql("INSERT EDGE INTO Cat.likes SELECT c.id, f.id FROM Cat c, Food f WHERE c.id = 1 AND f.id = 1")
    gs.sql("INSERT EDGE INTO Dog.likes SELECT d.id, f.id FROM Dog d, Food f WHERE d.id = 1 AND f.id = 2")
    gs.sql("CREATE NODE VIEW Pet AS SELECT cname AS pname FROM Cat UNION ALL SELECT dname FROM Dog")
    val q =
      """SELECT p.pname AS pname, f.fname AS fname
        |FROM Pet p, Food f MATCH p-[likes]->f ORDER BY pname""".stripMargin
    def rows(s2: GraphSession) =
      s2.sql(q).collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows(gs) == Seq(("rex", "bone"), ("tom", "fish")))

    // a FRESH catalog + session reads the persisted view registry
    val gs2 = new GraphSession(spark, new GraphCatalog(spark, dir))
    assert(rows(gs2) == Seq(("rex", "bone"), ("tom", "fish")))

    // 100 TB posture: a view-column predicate pushes through the union
    // into EACH member's parquet scan (Catalyst rewrites pname → cname
    // on the Cat branch and → dname on the Dog branch)
    val plan = gs2.sql(
      """SELECT p.pname AS pname FROM Pet p, Food f
        |MATCH p-[likes]->f WHERE p.pname = 'tom'""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(cname,tom)") ||
      plan.contains("cname), EqualTo"), s"no pushed filter on cname:\n$plan")
    assert(plan.contains("EqualTo(dname,tom)") ||
      plan.contains("dname), EqualTo"), s"no pushed filter on dname:\n$plan")

    // drops persist: a third reload no longer sees the view
    gs2.sql("DROP NODE VIEW Pet")
    val gs3 = new GraphSession(spark, new GraphCatalog(spark, dir))
    intercept[Exception] { rows(gs3) }
  }

  /** Proc bodies with control flow (`WSqlParser.cs:233-362`): DECLARE /
    * SET variables, WHILE loops driving graph DML, IF/ELSE-IF chains.
    */
  test("proc control flow: DECLARE / WHILE / IF over dialect statements") {
    val dir = Files.createTempDirectory("graft_procflow").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE NODE TABLE Item (id INT NODEID)")
    gs.sql("""CREATE PROCEDURE FillItems @n INT AS BEGIN
             |  DECLARE @i INT = 0;
             |  WHILE @i < @n
             |  BEGIN
             |    SET @i = @i + 1;
             |    INSERT NODE INTO Item SELECT * FROM VALUES (@i) AS t(id);
             |  END
             |  IF @i = @n
             |  BEGIN
             |    SELECT COUNT(*) AS cnt FROM Item
             |  END
             |  ELSE
             |  BEGIN
             |    SELECT CAST(-1 AS BIGINT) AS cnt
             |  END
             |END""".stripMargin)
    // the loop ran 4 times (4 INSERT NODE statements), the IF then-branch
    // saw @i = @n and counted the inserted rows
    assert(gs.sql("EXEC FillItems 4").head().getLong(0) == 4L)

    // ELSE IF chains dispatch on the runtime value
    gs.sql("""CREATE PROCEDURE Sign @x INT AS BEGIN
             |  IF @x > 0 BEGIN SELECT 'pos' AS s END
             |  ELSE IF @x = 0 BEGIN SELECT 'zero' AS s END
             |  ELSE BEGIN SELECT 'neg' AS s END
             |END""".stripMargin)
    assert(gs.sql("EXEC Sign 5").head().getString(0) == "pos")
    assert(gs.sql("EXEC Sign 0").head().getString(0) == "zero")
    assert(gs.sql("EXEC Sign -3").head().getString(0) == "neg")

    // a runaway WHILE is cut off by the (configurable) step guard
    gs.sql("""CREATE PROCEDURE Forever AS BEGIN
             |  DECLARE @q INT = 0;
             |  WHILE 1 = 1 BEGIN SET @q = @q + 1; END
             |END""".stripMargin)
    spark.conf.set("spark.graft.proc.maxSteps", "40")
    try intercept[IllegalArgumentException] { gs.sql("EXEC Forever") }
    finally spark.conf.unset("spark.graft.proc.maxSteps")
  }

  /** The DML table swap goes through the Hadoop FileSystem API, so the
    * same code path serves an explicit `file:`-scheme location (the
    * stand-in for hdfs:/s3a: — java.nio would reject the scheme), and
    * an interrupted swap recovers from the `.bak` on the next catalog
    * load via the swap-marker pointer file.
    */
  test("rewrite swap is Hadoop-FS-portable and crash-recoverable") {
    val dir = "file:" + Files.createTempDirectory("graft_hfs").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE NODE TABLE Pt (id INT NODEID, v INT)")
    gs.sql("INSERT NODE INTO Pt SELECT * FROM VALUES (1,10),(2,20) AS t(id,v)")
    gs.sql("UPDATE Pt SET v = 99 WHERE id = 2") // rewrite + swap
    val cat1 = new GraphCatalog(spark, dir)
    assert(cat1.provider.nodeTable("Pt").orderBy("id")
      .select("v").collect().map(_.getInt(0)).toSeq == Seq(10, 99))

    // simulate a crash between the two renames: live dir moved aside,
    // marker still present — the next catalog load must restore the .bak
    val live = new org.apache.hadoop.fs.Path(s"$dir/tables/Pt")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(s"$dir/tables/.Pt_bak")
    val marker = new org.apache.hadoop.fs.Path(s"$dir/tables/.Pt_swap")
    assert(fs.rename(live, bak))
    fs.create(marker, true).close()
    val cat2 = new GraphCatalog(spark, dir)
    assert(!fs.exists(marker) && fs.exists(live) && !fs.exists(bak))
    assert(cat2.provider.nodeTable("Pt").orderBy("id")
      .select("v").collect().map(_.getInt(0)).toSeq == Seq(10, 99))
  }

  /** A fresh catalog has zero tables; statement paths that register
    * temp views (proc scalar evaluation) must not trip over the
    * implicit GlobalNodeView, which has no members to union yet.
    */
  test("procs evaluate on a fresh empty catalog") {
    val dir = Files.createTempDirectory("graft_empty").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE PROCEDURE P AS BEGIN DECLARE @x INT = 1; SELECT @x AS v END")
    assert(gs.sql("EXEC P").head().getInt(0) == 1)
  }

  /** The bucketed layout must survive the Hadoop-FS swap under an
    * explicit scheme too: external bucketed registration, DML rewrite,
    * and reload all against a `file:`-scheme location.
    */
  test("bucketed catalog works at a file:-scheme location") {
    val dir = "file:" + Files.createTempDirectory("graft_hfsb").toString
    val gs = new GraphSession(spark,
      new GraphCatalog(spark, dir, bucketsOpt = Some(4)))
    gs.sql("CREATE NODE TABLE Bk (id INT NODEID, v INT)")
    gs.sql("INSERT NODE INTO Bk SELECT * FROM VALUES (1,10),(2,20),(3,30) AS t(id,v)")
    gs.sql("UPDATE Bk SET v = 99 WHERE id = 3")
    val reloaded = new GraphCatalog(spark, dir)
    assert(reloaded.buckets.contains(4))
    assert(reloaded.provider.nodeTable("Bk").orderBy("id")
      .select("v").collect().map(_.getInt(0)).toSeq == Seq(10, 20, 99))
  }

  /** T-SQL never expands variables inside string literals, and IF/WHILE
    * predicates with scalar subqueries must observe loop-body DML (the
    * temp views re-register per evaluation, not once per EXEC).
    */
  test("proc vars: literal-immune substitution; predicates see loop DML") {
    val dir = Files.createTempDirectory("graft_procvars").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE NODE TABLE Thing (id INT NODEID)")
    gs.sql("""CREATE PROCEDURE LitSafe @n INT AS BEGIN
             |  SELECT '@n items' AS s, @n AS v
             |END""".stripMargin)
    val r = gs.sql("EXEC LitSafe 7").head()
    assert(r.getString(0) == "@n items", "literal '@n' was corrupted")
    assert(r.getInt(1) == 7)
    // the WHILE predicate counts a table the loop body inserts into: a
    // stale captured view would never see the inserts (the small step
    // cap turns that bug into a fast failure instead of a hang)
    gs.sql("""CREATE PROCEDURE FillTo @n INT AS BEGIN
             |  DECLARE @i INT = 0;
             |  WHILE (SELECT COUNT(*) FROM Thing) < @n
             |  BEGIN
             |    SET @i = @i + 1;
             |    INSERT NODE INTO Thing SELECT * FROM VALUES (@i) AS t(id);
             |  END
             |  SELECT COUNT(*) AS cnt FROM Thing
             |END""".stripMargin)
    spark.conf.set("spark.graft.proc.maxSteps", "60")
    try assert(gs.sql("EXEC FillTo 3").head().getLong(0) == 3L)
    finally spark.conf.unset("spark.graft.proc.maxSteps")
  }

  test("multi-statement script executes the tutorial batch in order") {
    val dir = Files.createTempDirectory("graft_script").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    val results = gs.sqlScript(
      """CREATE NODE TABLE People (id INT NODEID, name STRING,
        |                          EDGE Knows TO People);
        |INSERT NODE INTO People
        |  SELECT * FROM VALUES (1,'Alice'),(2,'Bob') AS t(id, name);
        |INSERT EDGE INTO People.Knows
        |  SELECT * FROM VALUES (1,2) AS t(s, d);
        |SELECT B.name FROM People A, People B MATCH A-[Knows]->B
        |  WHERE A.name = 'Alice'""".stripMargin)
    assert(results.length == 4)
    assert(results(1).head().getLong(0) == 2) // rows inserted
    assert(results(3).collect().map(_.getString(0)).toSeq == Seq("Bob"))
    // ANALYZE GRAPH statement refreshes planner stats (sampled mode
    // populates the LocalRelation samples + histograms)
    assert(gs.sql("ANALYZE GRAPH SAMPLED").head().getLong(0) == 1L)
    assert(gs.stats.samples.contains("People"))
    assert(gs.stats.rows("People") == 2L)
  }

  test("ALTER TABLE round-trip: add/drop property and edge, SQL UPDATE") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_alter").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("""CREATE NODE TABLE People (
             |  id INT NODEID, name STRING, EDGE Knows TO People)""".stripMargin)
    gs.sql("""INSERT NODE INTO People
             |SELECT * FROM VALUES (1,'Alice'),(2,'Bob') AS t(id, name)""".stripMargin)
    gs.sql("""INSERT EDGE INTO People.Knows
             |SELECT * FROM VALUES (1,2) AS t(s, d)""".stripMargin)

    // ADD COLUMN, then UPDATE it through the dialect
    gs.sql("ALTER TABLE People ADD COLUMN age INT")
    assert(gs.sql("UPDATE People SET age = 30 WHERE name = 'Alice'")
      .head().getLong(0) == 1)
    val ages = gs.catalog.get.provider.nodeTable("People")
      .select("name", "age").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(ages("Alice").contains(30) && ages("Bob").isEmpty)

    // graph-maintained columns refuse UPDATE
    intercept[IllegalArgumentException] {
      gs.sql("UPDATE People SET InDegree = 5")
    }

    // ADD EDGE: adjacency/tombstone/degree + reversed mirror appear and
    // DML works over the new edge immediately
    gs.sql("ALTER TABLE People ADD EDGE Likes TO People (strength DOUBLE)")
    assert(gs.sql(
      """INSERT EDGE INTO People.Likes
        |SELECT * FROM VALUES (2, 1, 0.9) AS t(s, d, w)""".stripMargin)
      .head().getLong(0) == 1)
    val t = gs.catalog.get.provider.nodeTable("People")
    assert(t.columns.contains("Likes") && t.columns.contains("LikesDel") &&
      t.columns.contains("LikesOutDegree") &&
      t.columns.contains("People_LikesReversed"))
    assert(t.filter(col("name") === "Alice")
      .select("InDegree").head().getInt(0) == 1) // Bob now likes Alice

    // DROP EDGE: columns gone on both sides, InDegree recomputed
    gs.sql("ALTER TABLE People DROP EDGE Likes")
    val t2 = gs.catalog.get.provider.nodeTable("People")
    assert(!t2.columns.contains("Likes") &&
      !t2.columns.contains("People_LikesReversed"))
    val inAfter = t2.select("name", "InDegree").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(inAfter == Map("Alice" -> 0, "Bob" -> 1))

    // DROP COLUMN persists across a catalog reload
    gs.sql("ALTER TABLE People DROP COLUMN age")
    val reloaded = new GraphCatalog(spark, dir)
    assert(!reloaded.provider.nodeTable("People").columns.contains("age"))
    assert(reloaded.schema.table("People").edges.map(_.name) == Seq("Knows"))
  }

  /** DROP NODE TABLE (`GraphViewConnection.cs:1496`): dependency guards
    * (inbound edges, views), cross-table reversed-column teardown
    * (`GraphViewConnection.cs:520`, `:1428`), recreate-after-drop, and
    * persistence across a catalog reload.
    */
  test("DROP NODE TABLE: guards, reversed teardown, recreate, reload") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_droptbl").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE NODE TABLE Place (id INT NODEID, pname STRING)")
    gs.sql("""CREATE NODE TABLE City (
             |  id INT NODEID, cname STRING, EDGE inPlace TO Place)""".stripMargin)
    gs.sql("INSERT NODE INTO Place SELECT * FROM VALUES (1,'north'),(2,'south') AS t(id,pname)")
    gs.sql("INSERT NODE INTO City SELECT * FROM VALUES (10,'oslo'),(11,'cairo') AS t(id,cname)")
    gs.sql("INSERT EDGE INTO City.inPlace SELECT c.id, p.id FROM City c, Place p WHERE c.id = 10 AND p.id = 1")
    gs.sql("INSERT EDGE INTO City.inPlace SELECT c.id, p.id FROM City c, Place p WHERE c.id = 11 AND p.id = 1")

    // City's edge induced a reversed mirror + InDegree on Place
    val place = gs.catalog.get.provider.nodeTable("Place")
    assert(place.columns.contains("City_inPlaceReversed"))
    assert(place.filter(col("pname") === "north")
      .select("InDegree").head().getInt(0) == 2)

    // guard: City's edges sink at Place → Place cannot drop
    intercept[IllegalArgumentException] { gs.sql("DROP NODE TABLE Place") }
    // guard: a view referencing City blocks its drop until the view goes
    gs.sql("CREATE NODE VIEW CityView AS SELECT cname AS vname FROM City")
    intercept[IllegalArgumentException] { gs.sql("DROP NODE TABLE City") }
    gs.sql("DROP NODE VIEW CityView")

    // drop City: table gone, Place loses the mirror, InDegree recomputed
    gs.sql("DROP NODE TABLE City")
    assert(!gs.catalog.get.schema.hasTable("City"))
    val placeAfter = gs.catalog.get.provider.nodeTable("Place")
    assert(!placeAfter.columns.contains("City_inPlaceReversed"))
    assert(placeAfter.select("InDegree").collect()
      .map(_.getInt(0)).toSet == Set(0))

    // IF EXISTS tolerates a missing table; the plain form refuses
    gs.sql("DROP NODE TABLE IF EXISTS City")
    intercept[IllegalArgumentException] { gs.sql("DROP NODE TABLE City") }

    // recreate under the same name: empty, and the edge re-induces the
    // reversed mirror on Place (same upkeep as the original create)
    gs.sql("CREATE NODE TABLE City (id INT NODEID, cname STRING, EDGE inPlace TO Place)")
    assert(gs.catalog.get.provider.nodeTable("City").count() == 0)
    assert(gs.catalog.get.provider.nodeTable("Place")
      .columns.contains("City_inPlaceReversed"))

    // reload: drop + recreate persisted
    val reloaded = new GraphCatalog(spark, dir)
    assert(reloaded.schema.hasTable("City"))
    assert(reloaded.provider.nodeTable("City").count() == 0)
    assert(reloaded.provider.nodeTable("Place")
      .filter(col("pname") === "north").select("InDegree").head().getInt(0) == 0)
  }

  /** Meta layout versioning: current metas carry `version: 1`, a meta
    * stamped by a NEWER library refuses to load with a clear message,
    * and a pre-versioning meta (no field) still loads as version 1.
    */
  test("catalog meta version: stamped on write, newer versions refused") {
    val dir = Files.createTempDirectory("graft_ver").toString
    val cat = new GraphCatalog(spark, dir)
    val (td, props) = GraphDdl.parseCreateNodeTable(
      "CREATE NODE TABLE T (id INT NODEID)", cat.nextTableId)
    cat.createNodeTable(td, props)

    val metaPath = java.nio.file.Path.of(dir, "graph_meta.json")
    val meta = Files.readString(metaPath)
    assert(meta.contains("\"version\" : 1") || meta.contains("\"version\":1"))
    new GraphCatalog(spark, dir) // reloads fine at the current version

    // the catalog wrote through Hadoop's checksummed local FS — editing
    // the file directly invalidates the .crc sidecar, so drop it
    def editMeta(content: String): Unit = {
      Files.writeString(metaPath, content)
      Files.deleteIfExists(java.nio.file.Path.of(dir, ".graph_meta.json.crc"))
    }

    // future layout → refuse with a message naming both versions
    editMeta(meta.replaceFirst(
      "\"version\"\\s*:\\s*1", "\"version\" : 99"))
    val ex = intercept[IllegalArgumentException] {
      new GraphCatalog(spark, dir)
    }
    assert(ex.getMessage.contains("99") && ex.getMessage.contains("1"))

    // pre-versioning meta (field absent) loads as version 1
    editMeta(meta.replaceFirst("\"version\"\\s*:\\s*1\\s*,", ""))
    assert(new GraphCatalog(spark, dir).schema.hasTable("T"))
  }

  /** The implicit GlobalNodeView must keep deriving from the LIVE
    * schema even after an edge view attaches to it — the reference
    * refreshes the global view at every table create/drop
    * (UpdateGlobalNodeView call sites in GraphViewConnection.cs).
    */
  test("GlobalNodeView tracks table DDL after an edge-view attach") {
    val dir = Files.createTempDirectory("graft_gview").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    gs.sql("CREATE NODE TABLE Food (id INT NODEID, fname STRING)")
    gs.sql("CREATE NODE TABLE Cat (id INT NODEID, cname STRING, EDGE likes TO Food)")
    gs.sql("INSERT NODE INTO Food SELECT * FROM VALUES (1,'fish') AS t(id,fname)")
    gs.sql("INSERT NODE INTO Cat SELECT * FROM VALUES (1,'tom') AS t(id,cname)")
    gs.sql("INSERT EDGE INTO Cat.likes SELECT c.id, f.id FROM Cat c, Food f")
    gs.sql("CREATE EDGE VIEW GlobalNodeView.eats AS SELECT NULL FROM Cat.likes")
    def globalCount(): Long =
      gs.sql("SELECT COUNT(*) AS n FROM GlobalNodeView").head().getLong(0)
    assert(globalCount() == 2)
    // a table created AFTER the attach still joins the global view
    gs.sql("CREATE NODE TABLE Dog (id INT NODEID, dname STRING)")
    gs.sql("INSERT NODE INTO Dog SELECT * FROM VALUES (1,'rex'),(2,'lassie') AS t(id,dname)")
    assert(globalCount() == 4)
    // the attached edge view still matches through the refreshed view
    assert(gs.sql(
      """SELECT f.fname AS f FROM GlobalNodeView g, Food f
        |MATCH g-[eats]->f""".stripMargin).count() == 1)
    // and a drop narrows it again
    gs.sql("DROP NODE TABLE Dog")
    assert(globalCount() == 2)
  }

  test("TRUNCATE DATA zeroes rows keeping schema/views/procs; CLEAR " +
    "DATA drops all schema objects keeping the catalog meta (the " +
    "reference's ClearData, GraphViewConnection.cs:419); DROP GRAPH " +
    "DATABASE drops the meta too (ClearGraphDatabase, :542)") {
    val dir = Files.createTempDirectory("graft_clear").toString
    val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
    def populate(): Unit = {
      gs.sql("""INSERT NODE INTO People
               |SELECT * FROM VALUES (1,'Alice'),(2,'Bob') AS t(id, name)"""
        .stripMargin)
      gs.sql("""INSERT EDGE INTO People.Knows
               |SELECT * FROM VALUES (1,2) AS t(a, b)""".stripMargin)
    }
    gs.sql("""CREATE NODE TABLE People (
             |  id INT NODEID, name STRING,
             |  EDGE Knows TO People)""".stripMargin)
    gs.sql("CREATE PROC CountPeople AS SELECT COUNT(*) AS n FROM People")
    gs.sql("CREATE NODE VIEW Folk AS SELECT * FROM People")
    populate()
    assert(gs.sql("EXEC CountPeople").head().getLong(0) == 2L)

    // TRUNCATE DATA (beyond-ref): rows gone, schema + views + procs
    // stay, reusable without re-declaring anything
    gs.sql("TRUNCATE DATA")
    assert(gs.sql("EXEC CountPeople").head().getLong(0) == 0L)
    assert(gs.sql("SELECT COUNT(*) AS n FROM Folk").head().getLong(0) == 0L)
    assert(gs.sql("SHOW NODE TABLES").count() == 1L)
    populate() // schema intact → same DDL-less reload works
    assert(gs.sql(
      """SELECT b.name FROM People a, People b MATCH a-[Knows]->b
        |WHERE a.name = 'Alice'""".stripMargin)
      .head().getString(0) == "Bob")

    // CLEAR DATA: the reference's ClearData — node tables, views and
    // procs ALL gone (schema objects dropped, not truncated); only the
    // catalog meta survives and the graph is immediately re-creatable
    gs.sql("CLEAR DATA")
    assert(gs.sql("SHOW NODE TABLES").count() == 0L)
    assert(gs.sql("SHOW PROCS").count() == 0L)
    assert(gs.sql("SHOW NODE VIEWS").count() == 1L) // only the implicit global
    intercept[Exception] { gs.sql("EXEC CountPeople") }
    gs.sql("CREATE NODE TABLE Dogs (id INT NODEID, name STRING)")
    gs.sql("INSERT NODE INTO Dogs SELECT * FROM VALUES (1,'Rex') AS t(id, name)")
    assert(gs.sql("SELECT COUNT(*) AS n FROM Dogs").head().getLong(0) == 1L)

    // CLEAR DATA survives a catalog reload: the persisted meta
    // reflects the post-clear state (only the re-created table)
    val gs2 = new GraphSession(spark, new GraphCatalog(spark, dir))
    assert(gs2.sql("SHOW NODE TABLES").collect().map(_.getString(0)).toSeq
      == Seq("Dogs"))
    assert(gs2.sql("SHOW PROCS").count() == 0L)

    // DROP GRAPH DATABASE: the meta goes too — a fresh graph starts
    gs2.sql("DROP GRAPH DATABASE")
    assert(gs2.sql("SHOW NODE TABLES").count() == 0L)
    gs2.sql("CREATE NODE TABLE Cats (id INT NODEID, name STRING)")
    gs2.sql("INSERT NODE INTO Cats SELECT * FROM VALUES (1,'Tom') AS t(id, name)")
    assert(gs2.sql("SELECT COUNT(*) AS n FROM Cats").head().getLong(0) == 1L)
  }

  test("clearData crash windows recover on the next catalog open") {
    // r10 ADVICE: the pre-r11 clearData deleted table dirs BEFORE
    // persisting the emptied meta, so a crash mid-clear left persisted
    // meta pointing at deleted paths. Now a _clear_pending tombstone
    // lands first; both crash windows replay to a finished clear.
    def freshCatalog(): (String, GraphSession) = {
      val dir = Files.createTempDirectory("graft_clear").toString
      val gs = new GraphSession(spark, new GraphCatalog(spark, dir))
      gs.sql("CREATE NODE TABLE People (id INT NODEID, name STRING)")
      gs.sql("INSERT NODE INTO People SELECT * FROM VALUES (1,'A') AS t(id, name)")
      (dir, gs)
    }

    // window 1: crash right AFTER the tombstone, before any delete —
    // simulated by writing the marker by hand over a healthy catalog
    val (dir1, _) = freshCatalog()
    Files.writeString(java.nio.file.Paths.get(dir1, "_clear_pending"),
      "People\n")
    val rec1 = new GraphSession(spark, new GraphCatalog(spark, dir1))
    assert(rec1.sql("SHOW NODE TABLES").count() == 0L,
      "recovery must finish the clear")
    assert(!Files.exists(java.nio.file.Paths.get(dir1, "_clear_pending")))
    assert(!Files.exists(java.nio.file.Paths.get(dir1, "tables", "People")))

    // window 2: crash after the data delete, before the meta persist —
    // marker present, table dir gone, meta still naming the table (the
    // exact state the old ordering left UNMARKED and unrecoverable)
    val (dir2, _) = freshCatalog()
    Files.writeString(java.nio.file.Paths.get(dir2, "_clear_pending"),
      "People\n")
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => deleteRec(c))
      Files.deleteIfExists(p)
    }
    deleteRec(java.nio.file.Paths.get(dir2, "tables", "People"))
    val rec2 = new GraphSession(spark, new GraphCatalog(spark, dir2))
    assert(rec2.sql("SHOW NODE TABLES").count() == 0L)
    assert(!Files.exists(java.nio.file.Paths.get(dir2, "_clear_pending")))
    // the recovered catalog is immediately usable
    rec2.sql("CREATE NODE TABLE Dogs (id INT NODEID, name STRING)")
    rec2.sql("INSERT NODE INTO Dogs SELECT * FROM VALUES (1,'Rex') AS t(id, name)")
    assert(rec2.sql("SELECT COUNT(*) AS n FROM Dogs").head().getLong(0) == 1L)
  }
}
