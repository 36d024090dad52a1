package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev measurement instrument (r16): per-statement wall times of the
  * two DDL-lifecycle query bodies (q_sql_drop_table, q_sql_clear_graph)
  * — replicates the declared bodies exactly, timing each gs.sql /
  * action so the optimization targets the statements that actually
  * cost, not the loop structure. Run AFTER a warm pass to separate JIT.
  */
object DdlProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to rounds).foreach { r =>
      println(s"---- round $r: q_sql_drop_table ----")
      dropTable(spark, sfDir)
      println(s"---- round $r: q_sql_clear_graph ----")
      clearGraph(spark, sfDir)
    }
    spark.stop()
  }

  private def step[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ddlprof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  private def dropTable(s: SparkSession, d: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_drop_p").toString
    val gs = new graft.lang.GraphSession(s,
      new graft.ddl.GraphCatalog(s, dir))
    graft.Tables.registerAll(s, d)
    step("CREATE Region2")(gs.sql(
      "CREATE NODE TABLE Region2 (rk INT NODEID, rname STRING)"))
    step("CREATE Nation2")(gs.sql(
      "CREATE NODE TABLE Nation2 (nk INT NODEID, nname STRING, EDGE inRegion TO Region2)"))
    step("INSERT Region2")(gs.sql(
      "INSERT NODE INTO Region2 SELECT r_regionkey AS rk, r_name AS rname FROM region"))
    step("INSERT Nation2")(gs.sql(
      "INSERT NODE INTO Nation2 SELECT n_nationkey AS nk, n_name AS nname FROM nation"))
    step("INSERT EDGE inRegion")(gs.sql(
      "INSERT EDGE INTO Nation2.inRegion SELECT n_nationkey, n_regionkey FROM nation"))
    step("collect pre InDegree")(
      gs.catalog.get.provider.nodeTable("Region2")
        .select(col("rname"), col("InDegree")).collect())
    step("DROP NODE TABLE Nation2")(gs.sql("DROP NODE TABLE Nation2"))
    step("re-CREATE Nation2")(gs.sql(
      "CREATE NODE TABLE Nation2 (nk INT NODEID, nname STRING, EDGE inRegion TO Region2)"))
    step("collect post InDegree")(
      gs.catalog.get.provider.nodeTable("Region2")
        .select(col("rname"), col("InDegree")).collect())
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def clearGraph(s: SparkSession, d: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_clear_p").toString
    val gs = new graft.lang.GraphSession(s,
      new graft.ddl.GraphCatalog(s, dir))
    graft.Tables.registerAll(s, d)
    step("CREATE T")(gs.sql("CREATE NODE TABLE T (k INT NODEID, name STRING)"))
    step("INSERT T (region)")(gs.sql(
      "INSERT NODE INTO T SELECT r_regionkey AS k, r_name AS name FROM region"))
    step("count T")(gs.catalog.get.provider.nodeTable("T").count())
    step("TRUNCATE DATA")(gs.sql("TRUNCATE DATA"))
    step("count T post-trunc")(gs.catalog.get.provider.nodeTable("T").count())
    step("INSERT T (nation)")(gs.sql(
      "INSERT NODE INTO T SELECT n_nationkey AS k, n_name AS name FROM nation"))
    step("count T repop")(gs.catalog.get.provider.nodeTable("T").count())
    step("CLEAR DATA")(gs.sql("CLEAR DATA"))
    step("CREATE T2")(gs.sql("CREATE NODE TABLE T2 (k INT NODEID, name STRING)"))
    step("INSERT T2 (supplier)")(gs.sql(
      "INSERT NODE INTO T2 SELECT s_suppkey AS k, s_name AS name FROM supplier"))
    step("DROP GRAPH DATABASE")(gs.sql("DROP GRAPH DATABASE"))
    step("re-CREATE T2")(gs.sql("CREATE NODE TABLE T2 (k INT NODEID, name STRING)"))
    step("re-INSERT T2")(gs.sql(
      "INSERT NODE INTO T2 SELECT s_suppkey AS k, s_name AS name FROM supplier"))
    step("collect names")(gs.catalog.get.provider.nodeTable("T2")
      .select(col("name")).collect())
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
