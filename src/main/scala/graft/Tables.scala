package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-generated parquet tables (TESTDATA.md).
  *
  * All query entry points receive an `sfDir` (e.g. /root/testdata/sf0.01);
  * tables are plain parquet reads so Catalyst pushes filters/projections
  * into the scan. At 100 TB these would be partitioned/bucketed tables in a
  * metastore — the access path (`spark.read.parquet`) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view named after itself (idempotent).
    * Used by SQL-expressed queries; DataFrame-expressed queries call
    * `load` directly.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}

/** One declared operator-query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet files. The driver hash-compares the two at sf0.01.
  */
final case class QueryDef(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(run, Some(oracle))
  def noOracle(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(run, None)
}
