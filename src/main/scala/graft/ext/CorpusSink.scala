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
  def writeShards(df: DataFrame, outDir: String, stratumCol: String,
      idCol: String, maxRecordsPerFile: Int): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    df.repartitionByRange(col(stratumCol), col(idCol))
      .sortWithinPartitions(col(stratumCol), col(idCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(stratumCol)
      .parquet(outDir)
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
