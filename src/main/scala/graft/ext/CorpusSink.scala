package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-corpus shard writer — the sink end of the curation pipeline
  * (beyond-reference extension; BASELINE north star).
  *
  * Layout contract for a 100 TB corpus:
  *  - directory-partitioned by stratum (source / language / mix bin) so
  *    downstream readers prune whole strata from the path alone;
  *  - files capped at `maxRecordsPerFile` so no shard exceeds one read
  *    task's budget and trainers can schedule per-file;
  *  - rows sorted by id within each file, and file contents a pure
  *    function of (data, stratum, cap) — re-running the writer over the
  *    same input reproduces the same shards, so a training run can be
  *    resumed against re-materialized data.
  */
object CorpusSink {

  /** Write `df` under `outDir` partitioned by `stratumCol`, each file
    * holding at most `maxRecordsPerFile` rows, deterministic order.
    *
    * Range-partitioned on (stratum, id) — NOT hash-on-stratum, which
    * would funnel a giant stratum through one task: a range split
    * spreads the hot stratum across tasks in id order, each task still
    * writes (mostly) one directory, and the cap bounds file size.
    */
  /** `bloomFilterCols`: write a parquet bloom filter per listed column
    * — the point-lookup complement to min/max stats. Sorted layout
    * makes RANGE predicates skip, but "doc_id = 93841723" on a
    * HASH-distributed id still overlaps most files' min/max span; a
    * footer bloom answers "definitely not in this row group" in one
    * footer read. Costs ~1 MB/row-group/column (NDV-sized), nothing
    * at read time when absent.
    */
  def writeShards(df: DataFrame, outDir: String, stratumCol: String,
      idCol: String, maxRecordsPerFile: Int,
      bloomFilterCols: Seq[String] = Nil): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    val w = df.repartitionByRange(col(stratumCol), col(idCol))
      .sortWithinPartitions(col(stratumCol), col(idCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
    bloomFilterCols.foldLeft(w) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
      .partitionBy(stratumCol)
      .parquet(outDir)
  }

  /** Z-order (Morton) clustered layout for multi-dimensional data
    * skipping — the layout move that makes "WHERE quality > x AND
    * n_tokens BETWEEN a AND b" read a sliver of a 100 TB corpus
    * instead of all of it. Directory partitioning prunes ONE
    * categorical dim; sorting prunes one MORE ordered dim; z-ordering
    * makes every file narrow in SEVERAL numeric dims at once, so
    * parquet min/max stats skip files/row-groups for predicates on
    * any clustered dim (the same layout Delta's OPTIMIZE ZORDER and
    * Iceberg's sort-order rewrite produce).
    *
    * Mechanics: each dim is bucketized by its own approx-quantile
    * cutpoints (rank space, so skewed dims still spread — equal-width
    * bucketing would put 99% of a power-law dim in one bucket), the
    * per-dim bucket indexes bit-interleave into the Morton key, and
    * the write range-partitions + sorts on that key. The bucket
    * lookup is a codegen'd fold over the ≤(2^bits-1)-element cutpoint
    * literal — O(2^bits) per row per dim, which is why `bits`
    * defaults to 8 (256 ranks/dim; file-level skipping needs no finer
    * resolution) and is capped at 12.
    *
    * Cutpoints come from one `approxQuantile` pass (driver holds
    * ≤ dims·2^bits doubles); the clustered write itself is one range
    * exchange + per-partition sort — the same cost envelope as
    * [[writeShards]].
    */
  def writeZOrdered(df: DataFrame, outDir: String, dims: Seq[String],
      bits: Int = 8, maxRecordsPerFile: Int = 1000000): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    df.sparkSession.sparkContext.setJobDescription(
      s"zorder-write ${dims.mkString(",")}")
    zOrdered(df, dims, bits)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .parquet(outDir)
  }

  /** `df` clustered by the Morton key of `dims` (range partition +
    * in-partition sort; the key column itself is dropped — it only
    * shapes the layout). Exposed separately so tests can assert
    * per-file narrowness without a write. */
  def zOrdered(df: DataFrame, dims: Seq[String], bits: Int = 8): DataFrame = {
    require(dims.nonEmpty && dims.size <= 3,
      "z-order over 1-3 dims (more dims dilute per-dim narrowness)")
    require(bits >= 1 && bits <= 12,
      "bits in [1,12]: the bucket fold is O(2^bits) per row per dim")
    val n = (1 << bits) - 1 // cutpoints per dim
    val cuts: Seq[Array[Double]] = dims.map { d =>
      df.stat.approxQuantile(d,
        (1 to n).map(_.toDouble / (n + 1)).toArray, 0.001)
    }
    val buckets = dims.zip(cuts).map { case (d, c) =>
      // rank bucket = #cutpoints at or below the value; nulls land in
      // bucket 0 (null >= cut is null → the `when` contributes 0)
      aggregate(typedlit(c), lit(0L),
        (acc, cut) => acc + when(col(d).cast("double") >= cut, 1L).otherwise(0L))
    }
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(b, i).bitwiseAND(lit(1L)), i * buckets.length + j))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** JSONL interchange — the lingua franca of public LLM corpora
    * (Dolma/RedPajama/C4 dumps are compressed JSON lines). One JSON
    * object per line, compressed per file (splittable-enough at shard
    * granularity: file caps bound each decompress task).
    */
  def writeJsonl(df: DataFrame, outDir: String,
      compression: String = "gzip",
      maxRecordsPerFile: Int = 1000000): Unit = {
    require(maxRecordsPerFile > 0)
    df.write.mode("overwrite")
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .json(outDir)
  }

  /** ORC interchange — the other columnar container warehouse stacks
    * exchange (Hive/Trino lakehouses ship ORC where public LLM dumps
    * ship JSONL): Spark's native vectorized ORC source keeps the same
    * predicate-pushdown / column-pruning contract as parquet. With
    * `sortCol` the shards write range-partitioned and sorted, so ORC's
    * per-stripe min/max statistics prune id-range scans the way the
    * Z-order face prunes multi-dimensional ones.
    */
  def writeOrc(df: DataFrame, outDir: String,
      sortCol: Option[String] = None,
      compression: String = "zstd"): Unit = {
    val out = sortCol.fold(df)(c =>
      df.repartitionByRange(col(c)).sortWithinPartitions(col(c)))
    out.write.mode("overwrite")
      .option("compression", compression).orc(outDir)
  }

  /** Read an ORC corpus with an EXPLICIT schema (never infer — the
    * footer read is cheap, but pinning the schema keeps a drifted
    * producer from silently widening downstream types).
    */
  def readOrc(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

  /** Read a JSONL corpus with an EXPLICIT schema and corrupt-line
    * quarantine: `(good, quarantined)`. Implemented as a raw text scan
    * + `from_json` per line — unlike the json datasource's
    * `_corrupt_record` column (whose filter requires caching the
    * read, a non-starter at corpus scale), this shape is one streaming
    * map pass: a line that fails to parse AS JSON yields a null
    * struct → quarantine; a parseable object with missing/mistyped
    * fields surfaces as nulls in `good` for the caller's gates.
    * Never infers schemas (an inference pass would read the corpus
    * twice and lock in whatever the first files contained).
    */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    val corruptCol = "__graft_corrupt"
    require(!schema.fieldNames.contains(corruptCol))
    // PERMISSIVE from_json reports an unparseable (or type-violating)
    // line through the designated corrupt-record field — a NULL struct
    // is never produced, so that is the only reliable quarantine signal
    val withCorrupt = schema.add(corruptCol,
      org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(dir).select(col("value"),
      from_json(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> corruptCol)).as("__j"))
    val good = parsed
      .filter(col(s"__j.$corruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"__j.`$f`")): _*)
    val bad = parsed
      .filter(col(s"__j.$corruptCol").isNotNull)
      .select(col("value").as("line"))
    (good, bad)
  }
}
