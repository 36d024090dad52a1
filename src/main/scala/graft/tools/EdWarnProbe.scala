package graft.ext

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch (lives in graft.ext for access to Dedup's internals):
  * replays q_dedup_edit_incremental step by step with stdout markers so
  * the DAGScheduler "broadcasting large task binary" WARNs interleave
  * with the step that submits them — the bisection harness for the
  * round-9 task-binary hunt.
  */
object EdWarnProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def step[T](name: String)(f: => T): T = {
      println(s"[probe] >>> $name"); Console.out.flush()
      val r = f
      println(s"[probe] <<< $name"); Console.out.flush()
      r
    }
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val hist = docs.filter(col("doc_id") % 10 =!= 0)
    val inc0 = docs.filter(col("doc_id") % 10 === 0)
    val inc = inc0.union(inc0.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" x")).as("text")))
    val idx = java.nio.file.Files.createTempDirectory("edwarn").toString
    val maxDist = 3; val q = 5

    step("writeEditIndex: gram df agg + write") {
      val grams = Dedup.editGramRows(hist, "text", "doc_id", maxDist, q)
      grams.groupBy("g").agg(count(lit(1)).as("gdf"))
        .write.mode("overwrite").parquet(s"$idx/df")
    }
    step("writeEditIndex: prefix build + write") {
      val grams = Dedup.editGramRows(hist, "text", "doc_id", maxDist, q)
      Dedup.editPrefixFrom(grams,
        spark.read.schema("g LONG, gdf LONG").parquet(s"$idx/df"),
        maxDist, q)
        .sortWithinPartitions("b")
        .write.mode("overwrite").parquet(s"$idx/prefix")
    }
    step("writeEditIndex: short write") {
      hist.filter(col("text").isNotNull)
        .select(col("doc_id").cast("long").as("id"),
          length(col("text")).as("len"))
        .filter(col("len") <= q * (maxDist + 1) - 1 + maxDist)
        .write.mode("overwrite").parquet(s"$idx/short")
    }
    val newPrefix = step("probe: newPrefix checkpoint") {
      import graft.Stage.StageOps
      Dedup.editPrefixFrom(
        Dedup.editGramRows(inc, "text", "doc_id", maxDist, q),
        spark.read.schema("g LONG, gdf LONG").parquet(s"$idx/df"),
        maxDist, q).stageBoundary
    }
    val bRows = step("probe: bucket collect") {
      newPrefix.select(col("b")).distinct().limit(1025)
        .collect().map(_.getLong(0))
    }
    println(s"[probe] buckets: ${bRows.length}")
    val index = spark.read
      .schema("id LONG, len INT, g LONG, b LONG")
      .parquet(s"$idx/prefix")
      .filter(col("b").isin(
        bRows.flatMap(b => Seq(b - 1, b, b + 1)).distinct: _*))
    def lenOk = abs(col("a.len") - col("b.len")) <= maxDist
    step("probe: crossSame only") {
      newPrefix.as("a").join(index.as("b"),
        col("a.g") === col("b.g") && col("a.b") === col("b.b") &&
          col("a.id") =!= col("b.id") && lenOk)
        .select(col("a.id")).count()
    }
    step("probe: selfSame only") {
      newPrefix.as("a").join(newPrefix.as("b"),
        col("a.g") === col("b.g") && col("a.b") === col("b.b") &&
          col("a.id") < col("b.id") && lenOk)
        .select(col("a.id")).count()
    }
    val candidates = step("probe: candidates union+distinct+cp") {
      import graft.Stage.StageOps
      val crossSame = newPrefix.as("a").join(index.as("b"),
        col("a.g") === col("b.g") && col("a.b") === col("b.b") &&
          col("a.id") =!= col("b.id") && lenOk)
      val crossUp = newPrefix.as("a").join(index.as("b"),
        col("a.b") + 1 === col("b.b") && col("a.g") === col("b.g") && lenOk)
      val crossDown = newPrefix.as("a").join(index.as("b"),
        col("a.b") === col("b.b") + 1 && col("a.g") === col("b.g") && lenOk)
      val selfSame = newPrefix.as("a").join(newPrefix.as("b"),
        col("a.g") === col("b.g") && col("a.b") === col("b.b") &&
          col("a.id") < col("b.id") && lenOk)
      val selfAdj = newPrefix.as("a").join(newPrefix.as("b"),
        col("a.b") + 1 === col("b.b") && col("a.g") === col("b.g") && lenOk)
      val shortMax = q * (maxDist + 1) - 1
      val newPartners = inc.filter(col("text").isNotNull)
        .select(col("doc_id").cast("long").as("id"),
          length(col("text")).as("len"))
        .filter(col("len") <= shortMax + maxDist)
        .withColumn("b", (col("len") / (maxDist + 1)).cast("long"))
      val newShort = newPartners
        .select(col("id"), col("len"),
          explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b"))
      val histShort = spark.read.schema("id LONG, len INT")
        .parquet(s"$idx/short")
        .withColumn("b", (col("len") / (maxDist + 1)).cast("long"))
      val crossShort = newShort.as("a").join(
        histShort.unionByName(newPartners).as("b"),
        col("a.b") === col("b.b") && col("a.id") =!= col("b.id") && lenOk)
      Seq(crossSame, crossUp, crossDown, selfSame, selfAdj, crossShort)
        .map(_.select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b")))
        .reduce(_ unionByName _)
        .distinct().stageBoundary
    }
    val corpusTexts = hist.select(col("doc_id"), col("text"))
      .unionByName(inc.select(col("doc_id"), col("text")))
      .filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("id"), col("text").as("t"))
    val candIds = candidates.select(col("id_a").as("__cid"))
      .union(candidates.select(col("id_b"))).distinct()
    step("probe: candIds count only") { candIds.count() }
    step("probe: corpusTexts full count") { corpusTexts.count() }
    step("probe: semi-join vs PARQUET-read candIds") {
      candIds.write.mode("overwrite").parquet(s"$idx/__cand")
      corpusTexts.join(spark.read.parquet(s"$idx/__cand"),
        col("id") === col("__cid"), "left_semi").count()
    }
    step("probe: rdd serialized sizes") {
      val ser = org.apache.spark.SparkEnv.get.closureSerializer.newInstance()
      def sz(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val rdd = df.queryExecution.toRdd
        println(s"[probe] $name rdd bytes: " +
          ser.serialize(rdd).limit() / 1024 + " KiB")
      }
      sz("candidates(cp)", candidates)
      sz("candIds", candIds)
      sz("corpusTexts", corpusTexts)
      sz("semiJoin", corpusTexts.join(candIds,
        col("id") === col("__cid"), "left_semi"))
    }
    step("probe: texts semi-join count, NO cp") {
      corpusTexts.join(candIds, col("id") === col("__cid"), "left_semi")
        .count()
    }
    step("probe: semi-join, AQE OFF") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val r = corpusTexts.join(candIds,
        col("id") === col("__cid"), "left_semi").count()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      r
    }
    step("probe: semi-join, broadcast OFF (SMJ)") {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r = corpusTexts.join(candIds,
        col("id") === col("__cid"), "left_semi").count()
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      r
    }
    step("probe: candIds write parquet (same shape as bcast compute)") {
      candIds.write.mode("overwrite").parquet(s"$idx/__cand2")
    }
    step("probe: semi-join with broadcast(candIds) hint") {
      corpusTexts.join(broadcast(candIds),
        col("id") === col("__cid"), "left_semi").count()
    }
    step("probe: semi-join, runtime bloom OFF") {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val r = corpusTexts.join(candIds,
        col("id") === col("__cid"), "left_semi").count()
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      r
    }
    step("probe: rdd DAG walk (AQE off)") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = corpusTexts.join(candIds,
        col("id") === col("__cid"), "left_semi")
      val rdd = joined.queryExecution.toRdd
      val ser = org.apache.spark.SparkEnv.get.closureSerializer.newInstance()
      val seen = scala.collection.mutable.Set[Int]()
      def walk(r: org.apache.spark.rdd.RDD[_], depth: Int): Unit = {
        if (!seen.add(r.id)) return
        val buf = try ser.serialize(r) catch { case _: Throwable => null }
        val size = if (buf == null) -1 else buf.limit() / 1024
        println("[probe] " + ("  " * depth) + r.getClass.getSimpleName +
          s" id=${r.id} ser=${size} KiB")
        if (buf != null && size > 500 &&
          r.dependencies.forall(d =>
            ser.serialize(d.rdd).limit() / 1024 < 100)) {
          val arr = new Array[Byte](buf.limit()); buf.get(arr)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"/tmp/rddbin_${r.id}.bin"), arr)
          println(s"[probe] dumped /tmp/rddbin_${r.id}.bin")
        }
        r.dependencies.foreach(d => walk(d.rdd, depth + 1))
      }
      walk(rdd, 0)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    step("probe: corpusTexts cp, NO semi-join") {
      import graft.Stage.StageOps
      corpusTexts.limit(100).stageBoundary.count()
    }
    val texts = step("probe: texts semi-join + cp") {
      import graft.Stage.StageOps
      corpusTexts.join(candIds, col("id") === col("__cid"), "left_semi")
        .stageBoundary
    }
    step("probe: final join WITHOUT levenshtein") {
      candidates
        .join(texts.select(col("id").as("id_a"), col("t").as("t_a")), "id_a")
        .join(texts.select(col("id").as("id_b"), col("t").as("t_b")), "id_b")
        .count()
    }
    step("probe: final join WITH levenshtein") {
      candidates
        .join(texts.select(col("id").as("id_a"), col("t").as("t_a")), "id_a")
        .join(texts.select(col("id").as("id_b"), col("t").as("t_b")), "id_b")
        .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist))
        .filter(col("dist") >= 0).count()
    }
    step("probe: final join, codegen OFF") {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val r = candidates
        .join(texts.select(col("id").as("id_a"), col("t").as("t_a")), "id_a")
        .join(texts.select(col("id").as("id_b"), col("t").as("t_b")), "id_b")
        .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist))
        .filter(col("dist") >= 0).count()
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      r
    }
    step("probe: full incremental") {
      Dedup.editDistancePairsIncremental(spark, inc, hist, idx,
        "text", "doc_id", maxDist, q).count()
    }
    spark.stop()
  }
}
