package graft.ext

import org.apache.spark.sql.SparkSession

/** Parameter sidecar for the persisted incremental-dedup indexes
  * (band / simhash / window): the probe's parameters (shingle n,
  * permutations, bands, window k, token hash) MUST equal the build's —
  * a mismatch silently returns wrong or empty pair sets otherwise.
  * `write` drops a `_params.json` next to the index; `check` compares
  * and fails fast. Hadoop FS throughout, so the sidecar lives wherever
  * the index parquet does (HDFS/S3 on a cluster).
  */
object IndexParams {

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir, "_params.json")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def render(params: Seq[(String, String)]): String =
    params.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")

  def write(spark: SparkSession, dir: String,
      params: Seq[(String, String)]): Unit = {
    val (f, p) = fs(spark, dir)
    val out = f.create(p, true)
    try out.write(render(params).getBytes("UTF-8"))
    finally out.close()
  }

  /** assert the probe's params equal the build's; a pre-sidecar index
    * (no `_params.json`) passes for back-compat
    */
  def check(spark: SparkSession, dir: String,
      params: Seq[(String, String)]): Unit = {
    val (f, p) = fs(spark, dir)
    if (f.exists(p)) {
      val in = f.open(p)
      val stored =
        try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      val expected = render(params)
      require(stored == expected,
        s"index at $dir was built with $stored but probed with " +
          s"$expected — rebuild the index or match its parameters")
    }
  }

  /** write when absent (append paths), check when present */
  def writeOrCheck(spark: SparkSession, dir: String,
      params: Seq[(String, String)]): Unit = {
    val (f, p) = fs(spark, dir)
    if (f.exists(p)) check(spark, dir, params)
    else write(spark, dir, params)
  }
}
