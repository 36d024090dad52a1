package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[QueryDef]]
  * in one of the registries below; the driver verifies each against its
  * DuckDB oracle at sf0.01 and benchmarks at sf0.1.
  */
object SparkEntry {

  /** All operator-query registries, merged. Later registries may not
    * shadow earlier names — duplicates are a bug, caught by the spec.
    */
  lazy val defs: Map[String, QueryDef] = {
    val all = Seq(
      _root_.graft.queries.Relational.defs,
      _root_.graft.queries.GraphQueries.defs,
      _root_.graft.queries.PathQueries.defs,
      _root_.graft.queries.DmlQueries.defs,
      _root_.graft.queries.PipelineQueries.defs,
      _root_.graft.queries.CurationQueries.defs,
      _root_.graft.queries.SqlQueries.defs,
      _root_.graft.queries.GraphxQueries.defs)
    val dups = all.flatMap(_.keys).groupBy(identity).collect {
      case (k, v) if v.size > 1 => k
    }
    require(dups.isEmpty, s"duplicate query names: $dups")
    all.reduce(_ ++ _)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the 2-hop MATCH through the full stack: dialect parser →
    * cost-based join-order search → explode/join plan → Spark SQL tail.
    */
  def entry(spark: SparkSession): DataFrame =
    defs("q_sql_match_2hop").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, v) => k -> v.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
