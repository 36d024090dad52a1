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
}
