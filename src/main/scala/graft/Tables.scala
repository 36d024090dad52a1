package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** `events.ts` arrives either as INT64 epoch-nanos (a timestamp[ns]
    * parquet column under `spark.sql.legacy.parquet.nanosAsLong`) or as a
    * timestamp[us] column, depending on the generator's pyarrow version.
    * Normalize to epoch-nanos LONG so downstream as-of/range/session
    * arithmetic stays integral either way (sessions run in UTC, so the
    * NTZ→TIMESTAMP cast is wall-clock-identity).
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
      case _ => df
    }

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

  /** Per-invocation scratch dir for stateful rows (incremental indexes,
    * bulk-load staging): created now, deleted recursively at JVM exit.
    * The result DataFrames read these dirs LAZILY, so an eager delete
    * inside the query body would race the consumer — a shutdown hook is
    * the correct lifetime (each Verify/Bench run is its own JVM, so
    * dirs no longer accumulate across runs).
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }

  /** duplicate-proof map constructor for a query file's `defs`: a
    * `Map(...)` literal silently keeps only the LAST entry per key, so
    * a repeated query name un-registers an operator without any test
    * noticing (it happened: two `q_heavy_hitters` shadowed the
    * Misra–Gries row for a round). SparkEntry catches duplicates
    * ACROSS files; this catches them within one.
    */
  def checked(entries: (String, QueryDef)*): Map[String, QueryDef] = {
    val dups = entries.map(_._1).groupBy(identity).collect {
      case (k, v) if v.size > 1 => k
    }
    require(dups.isEmpty, s"duplicate query names in one file: $dups")
    entries.toMap
  }
}
