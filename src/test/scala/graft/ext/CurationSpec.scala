package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      // "eval set" (bench)
      (1L, "bench", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "bench", "one two three four five six seven eight nine"),
      // corpus: 10 contains a verbatim 6-token span of doc 1 → 2 shared
      // 5-grams; 11 shares nothing; 12 shares a verbatim span of doc 2
      (10L, "web", "intro words alpha beta gamma delta epsilon zeta trailing"),
      (11L, "web", "totally unrelated content with its own private phrasing here"),
      (12L, "forum", "prefix one two three four five six suffix words")
    ).toDF("doc_id", "source", "text")
  }

  test("decontamination flags exactly the overlapping docs with hit counts") {
    val corpus = docs.filter(col("source") =!= "bench")
    val bench = docs.filter(col("source") === "bench")
    val hits = Decontaminate.overlapHits(corpus, bench, "text", "doc_id",
      n = 5, minHits = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 10: span "alpha..zeta" = 6 tokens → 2 distinct 5-grams of doc 1
    // doc 12: span "one..six" = 6 tokens → 2 distinct 5-grams of doc 2
    assert(hits == Map(10L -> ((2L, 1L)), 12L -> ((2L, 1L))))
    // raising minHits above the evidence drops them
    assert(Decontaminate.overlapHits(corpus, bench, "text", "doc_id",
      n = 5, minHits = 3).isEmpty)
  }

  test("overlapFraction: fully-contained doc scores 1, clean doc 0, " +
    "partial doc the exact gram share; too-short docs absent") {
    val s = spark
    import s.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),          // 1 gram, contained
      (2L, "one two three four five six seven"),       // 3 grams, none hit
      (3L, "alpha beta gamma delta epsilon zeta other"), // 3 grams, 2 hit
      (4L, "too short")).toDF("doc_id", "text")
    val got = Decontaminate.overlapFraction(corpus, bench,
      "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 1L, 1.0)))
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((3L, 2L, 0.666667)))
    assert(!got.contains(4L))
  }

  test("clean drops flagged docs and nothing else") {
    val corpus = docs.filter(col("source") =!= "bench")
    val bench = docs.filter(col("source") === "bench")
    val kept = Decontaminate.clean(corpus, bench, "text", "doc_id",
      n = 5, minHits = 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
  }

  test("heavyHittersPerGroup: per-group exact counts above the per-group " +
    "support, guarantee guard enforced") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // group a: 10 tokens; "hot" 4/10 (> 0.3), "warm" 3/10 (equal to
      // 0.3 → strictly-greater drops it), rest below
      (1L, "a", "hot hot warm cold mild"),
      (2L, "a", "hot hot warm warm cool"),
      // group b: "hot" is NOT heavy here (1/10); "bulk" 5/10 is
      (3L, "b", "bulk bulk bulk hot tiny"),
      (4L, "b", "bulk bulk x y z")).toDF("doc_id", "source", "text")
    val got = TextFunctions.heavyHittersPerGroup(
      docs, "text", "source", support = 0.3, sketchK = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "hot") -> 4L, ("b", "bulk") -> 5L))
    intercept[IllegalArgumentException] {
      TextFunctions.heavyHittersPerGroup(
        docs, "text", "source", support = 0.01, sketchK = 16)
    }
  }

  test("fuzzyMatches finds cross-corpus near-dups with exact jaccard; " +
    "fuzzyClean drops exactly the flagged docs") {
    val s = spark
    import s.implicits._
    val w = (1 to 40).map(i => s"w$i")
    val b1 = w.mkString(" ")                        // 40 tokens, 38 shingles
    val b2 = (1 to 40).map(i => s"v$i").mkString(" ")
    val c1 = (w.init :+ "CHANGED").mkString(" ")    // last word edited
    val bench = Seq((1L, b1), (2L, b2)).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, c1),    // near-dup of bench 1
      (11L, "totally unrelated content with its own private phrasing"),
      (12L, b2)     // exact copy of bench 2
    ).toDF("doc_id", "text")
    // expected jaccard of (c1, b1) from first principles: editing the
    // last of 40 tokens replaces the final 3 of 38 distinct 3-shingles
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val j1 = sh(c1).intersect(sh(b1)).size.toDouble /
      sh(c1).union(sh(b1)).size
    val got = Decontaminate.fuzzyMatches(corpus, bench, "text", "doc_id",
      n = 3, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet == Set((10L, 1L), (12L, 2L)))
    assert(got((10L, 1L)) == j1)
    assert(got((12L, 2L)) == 1.0)
    // raising τ above the edited pair's jaccard drops it at the
    // verification stage (the candidate still collides in the bands)
    val strict = Decontaminate.fuzzyMatches(corpus, bench, "text", "doc_id",
      n = 3, minJaccard = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((12L, 2L)))
    val kept = Decontaminate.fuzzyClean(corpus, bench, "text", "doc_id",
      n = 3, minJaccard = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
  }

  test("weightedSample matches an independent Efraimidis–Spirakis " +
    "reference; zero-weight rows excluded; per-stratum face exact") {
    val s = spark
    import s.implicits._
    val rows = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", (i % 7) match {
        case 0 => 0L          // weight 0 → never sampled
        case w => w.toLong
      }))
    val df = rows.toDF("id", "src", "w")
    // independent reference: JDK md5, same 60-bit prefix, same key
    def hash60(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.take(8).zipWithIndex.map { case (b, i) =>
        (b & 0xffL) << (56 - 8 * i)
      }.sum >>> 4 // 64 → top 60 bits = first 15 hex digits
    }
    def key(id: Long, w: Long): Double =
      math.log((hash60(id) + 1.0) / math.pow(2.0, 60)) / w
    val expect = rows.filter(_._3 > 0)
      .sortBy { case (id, _, w) => (-key(id, w), id) }
      .take(10).map(_._1).toSet
    val got = Mixing.weightedSample(df, "id", col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // deterministic run-to-run
    assert(Mixing.weightedSample(df, "id", col("w"), 10)
      .collect().map(_.getLong(0)).toSet == got)
    // NaN weights are dropped, not sorted first (Spark orders NaN above
    // every value — a bare `w > 0` filter would admit them)
    val withNaN = rows.map { case (id, src, w2) =>
      (id, src, if (id <= 5) Double.NaN else w2.toDouble) }
      .toDF("id", "src", "w")
    val gotNaN = Mixing.weightedSample(withNaN, "id", col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(gotNaN.intersect(Set(1L, 2L, 3L, 4L, 5L)).isEmpty)
    // per-stratum: exactly k per stratum, and each stratum's set is the
    // reference top-k within the stratum
    val perStratum = Mixing.weightedSamplePerStratum(
      df, "id", "src", col("w"), 5)
      .collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    Seq("a", "b").foreach { stratum =>
      val ref = rows.filter(r => r._2 == stratum && r._3 > 0)
        .sortBy { case (id, _, w) => (-key(id, w), id) }
        .take(5).map(_._1).toSet
      assert(perStratum(stratum) == ref, s"stratum $stratum")
    }
  }

  test("stratified sampling is deterministic and rate-monotone") {
    val s = spark
    import s.implicits._
    val rows = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val once = Mixing.sampleStratified(rows, "id", "src",
      Map("a" -> 0.2, "b" -> 0.8)).collect().map(_.getLong(0)).toSet
    val twice = Mixing.sampleStratified(rows, "id", "src",
      Map("a" -> 0.2, "b" -> 0.8)).collect().map(_.getLong(0)).toSet
    assert(once == twice) // pure function of id — no rand()
    val aKept = once.count(_ % 2 == 0)
    val bKept = once.count(_ % 2 == 1)
    // 500 candidates per stratum; the md5 hash is uniform enough that
    // 20%/80% land within a generous band
    assert(aKept > 60 && aKept < 140, s"a kept $aKept")
    assert(bKept > 330 && bKept < 470, s"b kept $bKept")
    // a rate-1.0 stratum keeps everything; 0.0 keeps nothing
    val all = Mixing.sampleStratified(rows, "id", "src",
      Map("a" -> 1.0, "b" -> 0.0)).collect().map(_.getLong(0))
    assert(all.forall(_ % 2 == 0) && all.length == 500)
  }

  test("temperatureSample flattens source shares as T grows") {
    val s = spark
    import s.implicits._
    // 900 "big" vs 100 "small" docs
    val rows = (0L until 1000L).map(i => (i, if (i < 900) "big" else "small"))
      .toDF("id", "src")
    def shares(t: Double): (Long, Long) = {
      val kept = Mixing.temperatureSample(rows, "id", "src", t, 0.4)
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      (kept.getOrElse("big", 0L), kept.getOrElse("small", 0L))
    }
    val (b1, s1) = shares(1.0)    // proportional: small stays ~10%
    val (b8, s8) = shares(8.0)    // near-uniform: small upweighted hard
    assert(s1.toDouble / (b1 + s1) < 0.2, s"T=1 small share ${(b1, s1)}")
    // expected: small saturates at 100 kept, big ~228 → share ~0.3
    assert(s8.toDouble / (b8 + s8) > 0.25, s"T=8 small share ${(b8, s8)}")
    // small-source acceptance saturates at 1.0 under extreme temperature
    assert(s8 <= 100)
    // deterministic: same inputs, same picks
    assert(shares(8.0) == ((b8, s8)))
  }

  test("unigramLogProb ranks common-token docs below rare-token docs") {
    val s = spark
    import s.implicits._
    val common = "the the the and and of" // all high-frequency
    val df = ((1L to 8L).map(i => (i, common)) :+
      (9L, "zyx qwv jkl")).toDF("doc_id", "text") // singletons
    val scores = TextFunctions.unigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) == scores(8L)) // identical docs, identical score
    assert(scores(9L) > scores(1L),
      s"rare-token doc must score higher: $scores")
  }

  test("chunkDocuments windows tokens with overlap; short docs one chunk") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y")).toDF("doc_id", "text")
    val chunks = TextFunctions.chunkDocuments(df, "text", "doc_id",
      chunkSize = 4, overlap = 1) // stride 3
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(chunks.filter(_._1 == 1L).map(_._3).toSeq == Seq(
      "a b c d", "d e f g", "g h i j", "j"))
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq == Seq("x y"))
  }

  test("packSequences fills ~budget-sized bins in id order per stratum") {
    val s = spark
    import s.implicits._
    // 10 docs of 30 tokens each in one stratum → budget 100: bins of
    // 0-3 docs: exclusive cumsum 0,30,60,90 → bin 0; 120..210 → bin 1…
    val rows = (0L until 10L).map(i => (i, "x", 30L)).toDF("id", "src", "nt")
    val out = Mixing.packSequences(rows, "id", "src", col("nt"), 100L)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 2L, 8L -> 2L, 9L -> 2L))
  }

  test("decontamination never goes cartesian; sampling is a pure scan-filter") {
    val corpus = docs.filter(col("source") =!= "bench")
    val bench = docs.filter(col("source") === "bench")
    val hits = Decontaminate.overlapHits(corpus, bench, "text", "doc_id",
      n = 5, minHits = 1)
    val plan = hits.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // sampling compiles to scan → filter: no shuffle, no join, no window
    val s = spark
    import s.implicits._
    val sampled = Mixing.sampleStratified(
      (0L until 100L).map(i => (i, "a")).toDF("id", "src"),
      "id", "src", Map("a" -> 0.5))
    val sPlan = sampled.queryExecution.executedPlan.toString
    assert(!sPlan.contains("Exchange") && !sPlan.contains("Join") &&
      !sPlan.contains("Window"), sPlan)
  }

  test("cluster resolution closes chains; scrub redacts and counts") {
    val s = spark
    import s.implicits._
    // chain 1~2~3 collapses to min id 1 even though (1,3) is not a pair;
    // 4 is a singleton; (10,11) a separate cluster
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L).toDF("doc_id")
    val out = Dedup.resolveClusters(pairs, docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      10L -> 10L, 11L -> 10L))

    val scrubbed = Seq("mail a@b.co and 1.2.3.4 call +12345678 done")
      .toDF("t")
      .select(Scrub.redact(col("t")).as("r"),
        Scrub.redactionCount(col("t")).as("n")).head()
    assert(scrubbed.getString(0) == "mail <EMAIL> and <IP> call <PHONE> done")
    assert(scrubbed.getInt(1) == 3)

    // the r7 classes: SSN keeps its own token (ordered before phones),
    // dashed international phones redact, bare digit runs pass through
    val more = Seq("ssn 123-45-6789 tel +1-555-0100 order 12345678 x")
      .toDF("t")
      .select(Scrub.redact(col("t")).as("r"),
        Scrub.redactionCount(col("t")).as("n"),
        Scrub.matchCount(col("t"), "ssn").as("ns"),
        Scrub.matchCount(col("t"), "phone").as("np")).head()
    assert(more.getString(0) == "ssn <SSN> tel <PHONE> order 12345678 x")
    assert(more.getInt(1) == 2 && more.getInt(2) == 1 && more.getInt(3) == 1)
  }

  test("repetition signals: dup and top n-gram fractions") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "a b a b a b"),     // 2-grams: ab ba ab ba ab → dup 3/5, top 3/5
      (2L, "u v w x y z"),     // all distinct → dup 0, top 1/5
      (3L, "solo")             // no 2-grams → 0, 0
    ).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
      TextFunctions.dupNgramFraction(col("text"), 2).as("d"),
      TextFunctions.topNgramFraction(col("text"), 2).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((0.6, 0.6)))
    assert(out(2L) == ((0.0, 0.2)))
    assert(out(3L) == ((0.0, 0.0)))
  }

  test("wordNgrams yields ordered n-gram strings; short docs give empty") {
    val s = spark
    import s.implicits._
    val out = Seq("The quick  Brown fox", "a b", "").toDF("t")
      .select(TextFunctions.wordNgrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("the quick brown", "quick brown fox"))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("capPerStratum equals the single-window top-k on skewed strata") {
    val s = spark
    import s.implicits._
    // stratum "hot" has 500 rows spread over many input partitions
    val rows = ((0L until 500L).map(i => (i, "hot", i % 97)) ++
      (0L until 10L).map(i => (i + 1000, "cold", i))).toDF("id", "src", "w")
      .repartition(8)
    val capped = Mixing.capPerStratum(rows, "src", 5,
      Seq(col("w").desc, col("id")))
    val got = capped.select("src", "id", "keep_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth via a plain single window
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("src").orderBy(col("w").desc, col("id"))
    val want = rows.withColumn("keep_rank", row_number().over(w).cast("long"))
      .filter(col("keep_rank") <= 5)
      .select("src", "id", "keep_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.count(_._1 == "hot") == 5 && got.count(_._1 == "cold") == 5)
  }

  test("boilerplate lines mine by doc frequency and strip in order; " +
    "sub-support templates survive; undersized sketch fails fast") {
    val s = spark
    import s.implicits._
    val docs = (0 until 20).map { i =>
      val parts = Seq(
        if (i % 2 == 0) Some("COOKIE BANNER") else None,
        Some(s"unique prose line $i"),
        if (i < 3) Some("rare footer") else None, // 15% < support
        Some(s"second unique line $i")).flatten
      (i.toLong, parts.mkString("\n"))
    }.toDF("doc_id", "text")
    val heavy = TextFunctions.boilerplateLines(docs, "text",
      support = 0.3, sketchK = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(heavy == Map("COOKIE BANNER" -> 10L), heavy.toString)
    val stripped = TextFunctions.stripBoilerplate(docs, "text",
      support = 0.3, sketchK = 256)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped(0L) == "unique prose line 0\nrare footer\n" +
      "second unique line 0")
    assert(stripped(1L) == "unique prose line 1\nrare footer\n" +
      "second unique line 1")
    assert(stripped(4L) == "unique prose line 4\nsecond unique line 4")
    // guarantee coverage check: k+1 must cover lines/(support·docs)
    val err = intercept[IllegalArgumentException] {
      TextFunctions.boilerplateLines(docs, "text", support = 0.001,
        sketchK = 1)
    }
    assert(err.getMessage.contains("survival guarantee"), err.getMessage)
  }

  test("tokenBudgetCap: bucketed prefix sum equals the naive single " +
    "window; straddling doc kept; zero budget empties a stratum") {
    val s = spark
    import s.implicits._
    val rows = ((0L until 400L).map(i => (i, "big", 7L + i % 13)) ++
      (0L until 30L).map(i => (i + 1000, "small", 11L)) ++
      (0L until 5L).map(i => (i + 2000, "off", 3L)))
      .toDF("id", "src", "tok").repartition(8)
    // several bucket widths, incl. 1 (degenerates to the naive window)
    for (buckets <- Seq(1, 4, 64)) {
      val got = Mixing.tokenBudgetCap(rows, "id", "src", col("tok"),
        Map("big" -> 500L, "off" -> 0L), defaultBudget = 150L,
        buckets = buckets)
        .select("src", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("src")
        .orderBy(Mixing.idHash(col("id")), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = rows
        .withColumn("cum", coalesce(sum(col("tok")).over(w), lit(0L)))
        .filter(col("cum") < when(col("src") === "big", 500L)
          .when(col("src") === "off", 0L).otherwise(150L))
        .select("src", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"buckets=$buckets")
      assert(got.count(_._1 == "off") == 0)
      // greedy prefix convention: the kept docs' tokens sum to AT
      // LEAST the budget when the stratum has enough supply (the
      // straddling doc is included)
      val bigTok = rows.filter(col("src") === "big")
        .join(got.filter(_._1 == "big").map(_._2).toSeq.toDF("id"), "id")
        .agg(sum("tok")).head().getLong(0)
      assert(bigTok >= 500L && got.nonEmpty)
    }
  }

  test("writeShards caps file rows, partitions by stratum, loses nothing") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val rows = (0L until 230L).map(i => (i, s"src${i % 3}", s"doc $i"))
      .toDF("doc_id", "source", "text")
    CorpusSink.writeShards(rows, dir, "source", "doc_id",
      maxRecordsPerFile = 25)
    val back = spark.read.parquet(dir)
    assert(back.count() == 230)
    assert(back.select("doc_id").distinct().count() == 230)
    // directory-partitioned by stratum
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("source=src0", "source=src1", "source=src2"))
    // every parquet file respects the row cap
    val files = dirs.flatMap(p =>
      new java.io.File(s"$dir/$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => s"$dir/$p/${f.getName}"))
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(spark.read.parquet(f).count() <= 25, s"file over cap: $f")
    }
  }

  test("writeShards bloomFilterCols lands a parquet bloom filter in " +
    "the footer for the listed column only") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards_bloom").toString
    val rows = (0L until 200L).map(i => (i, s"src${i % 2}", s"doc $i"))
      .toDF("doc_id", "source", "text")
    CorpusSink.writeShards(rows, dir, "source", "doc_id",
      maxRecordsPerFile = 100, bloomFilterCols = Seq("doc_id"))
    val file = new java.io.File(s"$dir/source=src0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val byPath = (0 until cols.size()).map(cols.get)
        .map(c => c.getPath.toDotString -> (c.getBloomFilterOffset >= 0))
        .toMap
      assert(byPath("doc_id"), s"no bloom filter on doc_id: $byPath")
      assert(!byPath("text"), s"unexpected bloom filter on text: $byPath")
    } finally reader.close()
  }

  test("curateV2 chains gate, span-clean, dedup, and decontamination") {
    val s = spark
    import s.implicits._
    val leak = "zebra quokka lemur gecko otter badger marmot weasel stoat"
    val good1 = "the quick brown fox jumps over a lazy dog and then " +
      "walks on with many more plain words beyond the usual count " +
      "to clear every minimum gate that this pipeline applies today"
    val good2 = s"alpha bravo charlie delta echo foxtrot golf hotel $leak " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey the and of is a full doc"
    val corpus = Seq(
      (1L, good1),
      (2L, good2),          // contains the 9-token bench leak → dirty
      (3L, "way too short to pass."),
      (4L, good1)           // verbatim copy: span-clean empties it
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"eval question about $leak answer key"))
      .toDF("doc_id", "text")
    val out = Pipeline.curateV2(corpus, bench, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("Gopher gate fails each rule independently") {
    val s = spark
    import s.implicits._
    val good = ("the quick brown fox jumps over a lazy dog and then " +
      "walks on with many more plain words in this long enough row " +
      "of text to clear the minimum word count gate easily today")
    val pages = Seq(
      (1L, good),                                   // passes all rules
      (2L, "too short for the gate."),              // word count
      (3L, good.replace("the ", "### ")),           // symbols + stopwords
      (4L, Seq.fill(20)("spam spam spam").mkString(" ")) // repetition
    ).toDF("doc_id", "text")
    val keep = pages.select(col("doc_id"),
      TextFunctions.gopherKeep(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("C4 line gate keeps punctuated >=3-word non-js lines only") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      (1L, "a good long sentence right here.\nshort line\nok.\n" +
        "enable javascript to view.\nanother proper sentence stays!"),
      (2L, "lorem ipsum dolor sit amet.\nreal words in a real sentence."),
      (3L, "code follows { x = 1 }\nthis sentence would survive alone."),
      (4L, "one surviving sentence only appears here.")
    ).toDF("doc_id", "text")
    val out = pages.select(col("doc_id"),
      TextFunctions.c4CleanLines(col("text")).as("cleaned"),
      TextFunctions.c4DocKeep(col("text")).as("keep"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(out(1L) == (("a good long sentence right here.\n" +
      "another proper sentence stays!", true)))
    // lorem ipsum: page-gated even though its lines pass the line gate
    assert(out(2L)._2 == false)
    // brace boilerplate: page-gated
    assert(out(3L)._2 == false)
    // clean but only one surviving sentence: below minSentences = 2
    assert(out(4L) == (("one surviving sentence only appears here.", false)))
  }

  test("shardAssign is a deterministic permutation with contiguous shard positions") {
    val s = spark
    import s.implicits._
    val rows = (0L until 500L).toDF("id")
    val a = Mixing.shardAssign(rows, "id", shards = 8, seed = "t1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // permutation: every id exactly once
    assert(a.map(_._1).sorted.toSeq == (0L until 500L))
    // each shard's positions are contiguous 1..n
    a.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length))
    }
    // deterministic across runs; different seed reorders
    val b = Mixing.shardAssign(rows, "id", shards = 8, seed = "t1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    val c = Mixing.shardAssign(rows, "id", shards = 8, seed = "t2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq != c.sortBy(_._1).toSeq)
    // the order is hash-scrambled, not id order: within some shard the
    // id sequence by pos is not monotone
    assert(a.groupBy(_._2).values.exists { g =>
      val ids = g.sortBy(_._3).map(_._1).toSeq
      ids != ids.sorted
    })
  }

  test("DSIR weights favor target-only grams and scores rank target-like docs first") {
    val s = spark
    import s.implicits._
    // target docs share 'alpha beta'; raw-only docs share 'uno dos'
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta gamma"),
      (2L, "en", "alpha beta delta alpha beta"),
      (3L, "zz", "uno dos tres uno dos"),
      (4L, "zz", "uno dos cuatro uno dos"),
      (5L, "zz", "alpha beta gamma alpha beta")
    ).toDF("doc_id", "lang", "text")
    val wdf = TextFunctions.dsirBucketWeightsDf(docs, "text",
      col("lang") === "en", buckets = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // counts are bounded by the bucket space and totals line up
    assert(wdf.length <= 64)
    assert(wdf.map(_._2).sum > 0 && wdf.map(_._3).sum >= wdf.map(_._2).sum)
    // target-only buckets (cp == cq: p̂-ratio 1 > (tp+B)/(tq+B)) weigh
    // positive, raw-only buckets negative
    assert(wdf.filter(w => w._2 == w._3 && w._2 > 0).forall(_._4 > 0))
    assert(wdf.filter(_._2 == 0).forall(_._4 < 0))
    val w = TextFunctions.dsirBucketWeights(docs, "text",
      col("lang") === "en", buckets = 64)
    assert(w.length == 64)
    val scores = docs.select(col("doc_id"),
      TextFunctions.dsirScore(col("text"), w).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 5 is raw-labelled but target-like: it must outscore the
    // uno-dos docs (that's the whole point of importance weighting)
    assert(scores(5L) > scores(3L) && scores(5L) > scores(4L))
    assert(scores(1L) > scores(3L) && scores(2L) > scores(4L))
  }

  test("Naive Bayes separates disjoint vocabularies; training is deterministic and map-only scoring has no join") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "greek", "alpha beta gamma alpha beta"),
      (2L, "greek", "beta gamma delta beta gamma"),
      (3L, "greek", "alpha gamma delta delta"),
      (4L, "latin", "unus duo tres unus duo"),
      (5L, "latin", "duo tres quattuor duo"),
      (6L, "mixed", "alpha unus beta duo gamma tres")
    ).toDF("doc_id", "label", "text")

    val B = 64
    val wdf = TextFunctions.nbTrainDf(docs, "text", "label", B).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // bounded by the (label, bucket) key space; totals line up per label
    assert(wdf.length <= 3 * B)
    val byLabel = wdf.groupBy(_._1)
    assert(byLabel.keySet == Set("greek", "latin", "mixed"))
    // recompute one weight from its own row: the Laplace formula holds
    byLabel.foreach { case (_, rows) =>
      val total = rows.map(_._3).sum
      rows.foreach { case (_, _, cnt, wt) =>
        assert(wt == math.round(math.log((cnt + 1.0) / (total + B)) * 1e6))
      }
    }

    val m1 = TextFunctions.nbTrain(docs, "text", "label", B)
    val m2 = TextFunctions.nbTrain(docs, "text", "label", B)
    assert(m1.labels.sameElements(m2.labels) &&
      m1.priors.sameElements(m2.priors) &&
      m1.weights.zip(m2.weights).forall { case (a, b) => a.sameElements(b) })
    assert(m1.labels.sameElements(Array("greek", "latin", "mixed")))

    val scored = docs
      .select(col("doc_id"), TextFunctions.dsirGrams(col("text")).as("__g"))
      .select(col("doc_id"), TextFunctions.nbPredict(col("__g"), m1).as("p"))
    // disjoint-vocabulary training docs classify back to their own class
    val preds = scored.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "greek" && preds(2L) == "greek" && preds(3L) == "greek")
    assert(preds(4L) == "latin" && preds(5L) == "latin")
    // scoring is map-only: the literal weight tables ride the plan —
    // no join, no aggregate exchange
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
  }

  test("bigramLogProb: novel-bigram docs score above repeated-bigram docs") {
    val s = spark
    import s.implicits._
    val df = ((1L to 8L).map(i => (i, "a b a b a b")) :+
      (9L, "p q r s") :+ (10L, "solo")).toDF("doc_id", "text")
    val scores = TextFunctions.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) == scores(8L)) // identical docs, identical score
    assert(scores(9L) > scores(1L),
      s"one-off bigrams must score higher: $scores")
    // a single-token doc has no bigram position and drops out
    assert(!scores.contains(10L))
    // deterministic across runs
    val again = TextFunctions.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores == again)
  }

  test("clusterBalancedSample caps dense cells, keeps sparse cells whole") {
    val s = spark
    import s.implicits._
    // id 0 anchors cell 0 (x-axis), id 1 anchors cell 1 (y-axis);
    // 40 more points crowd cell 0, 4 more sit in cell 1
    val rows =
      Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))) ++
        (2L to 41L).map(i => (i, Seq(1f, 0.01f * (i % 3)))) ++
        (42L to 45L).map(i => (i, Seq(0.01f * (i % 3), 1f)))
    val df = rows.toDF("id", "vec")
    val kept = Mixing.clusterBalancedSample(df, "id", "vec",
      k = 2, perCell = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCell = kept.groupBy(_._2)
    assert(byCell(0).length == 10, s"dense cell must cap at 10: $byCell")
    assert(byCell(1).length == 5, s"sparse cell keeps all 5: $byCell")
    // rank is the per-cell position in id order: smallest ids survive
    assert(byCell(0).map(_._1).sorted.toSeq ==
      (Seq(0L) ++ (2L to 10L)).sorted)
    assert(byCell.values.flatten.forall(_._3 <= 10))
  }

  test("CDC chunks re-align after a prefix edit; dup stats flag recycled spans") {
    val s = spark
    import s.implicits._
    val words = (0 until 200).map(i => s"w$i")
    val base = words.mkString(" ")
    val df = Seq(
      (1L, base),
      (2L, "zz " + base), // prefix edit
      (3L, words.slice(50, 150).mkString(" ")), // recycled span of 1
      (4L, (0 until 60).map(i => s"own$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val chunks = Cdc.cdcChunks(df, "text", "doc_id", divisor = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // per doc: chunk_idx contiguous from 0 and token mass preserved
    Seq(1L -> 200, 2L -> 201, 3L -> 100, 4L -> 60).foreach { case (id, n) =>
      val cs = chunks.filter(_._1 == id).sortBy(_._2)
      assert(cs.map(_._2).toSeq == cs.indices.toSeq)
      assert(cs.map(_._3).sum == n, s"doc $id token mass")
    }
    // content-defined boundaries: the prefixed copy re-aligns — all
    // chunks except the edited first one carry identical hashes
    val h1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._4)
    val h2 = chunks.filter(_._1 == 2L).sortBy(_._2).map(_._4)
    assert((h1.toSet -- h2.toSet).size <= 1 && (h2.toSet -- h1.toSet).size <= 1,
      s"prefix edit must perturb at most the first chunk: ${h1.length}/${h2.length}")
    assert((h1.toSet & h2.toSet).size >= h1.length - 1)
    // chunk-level dedup: recycled spans flagged, unrelated doc clean
    val stats = Cdc.dupChunkStats(df, "text", "doc_id", divisor = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats(1L) > 0 && stats(2L) > 0, s"shared chunks must flag: $stats")
    assert(stats(3L) > 0, s"recycled span must flag: $stats")
    assert(stats(4L) == 0, s"unrelated doc must stay clean: $stats")
  }

  test("heavyHitters: a tiny sketch prunes a huge tail yet the recount " +
    "equals the exact GROUP BY answer") {
    val s = spark
    import s.implicits._
    // 3 hot tokens at freq 500 over a 5000-singleton tail; sketchK=32
    // is far below the vocabulary, so the sketch genuinely prunes.
    // Guarantee: freq > n/(k+1) = 6500/33 ≈ 197 survives any merge.
    val docs = ((0 until 500).map(i => (i.toLong, "hot1 hot2 hot3")) ++
      (0 until 5000).map(i => (10000L + i, s"tail$i"))).toDF("id", "text")
      .repartition(8) // several partials → real sketch merging
    val hh = TextFunctions.heavyHitters(docs, "text",
      support = 0.04, sketchK = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("hot1" -> 500L, "hot2" -> 500L, "hot3" -> 500L),
      s"exact heavy hitters expected: $hh")
    // deterministic despite the merge-order-dependent sketch: the
    // recount decides
    val again = TextFunctions.heavyHitters(docs, "text",
      support = 0.04, sketchK = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == again)
  }

  test("negativeSample: no self, no same-group, draw-ordered, " +
    "deterministic, matches a driver-side replay") {
    val s = spark
    import s.implicits._
    val n = 120L
    val corpus = (0L until n).map(i => (i, (i % 4).toInt)).toDF("id", "g")
    val anchors = corpus.filter(col("id") < 6)
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def draw(q: Long, j: Int) =
      java.lang.Long.parseLong(md5hex(s"$q:$j").take(15), 16) % n
    val got = Mixing.negativeSample(anchors, corpus, "id", "g",
      n = n, k = 5, draws = 48)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    // driver-side replay of the same draw chain
    (0L until 6L).foreach { q =>
      val seen = scala.collection.mutable.LinkedHashSet[Long]()
      (0 until 48).foreach { j =>
        val c = draw(q, j)
        if (c != q && c % 4 != q % 4 && seen.size < 48) seen += c
      }
      val want = seen.take(5).toSeq
      val mine = (1 to 5).map(rn => got((q, rn)))
      assert(mine == want, s"anchor $q: $mine vs $want")
      mine.foreach { c =>
        assert(c != q && c % 4 != q % 4)
      }
    }
    // deterministic across runs
    val again = Mixing.negativeSample(anchors, corpus, "id", "g",
      n = n, k = 5, draws = 48)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("property: bm25 matches a driver-side reference on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 10).map(i => s"w$i")
    val docs = (0 until 80).map { i =>
      val len = 3 + rnd.nextInt(10)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(10))).mkString(" "))
    }
    val terms = Seq("w1", "w3", "w7")
    val got = TextFunctions.bm25(docs.toDF("doc_id", "text"),
      "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = docs.length
    val avgdl = toks.values.map(_.length).sum.toDouble / n
    val dfT = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    val want = toks.flatMap { case (id, ws) =>
      val sc = terms.map { t =>
        val tf = ws.count(_ == t)
        if (tf == 0) 0.0
        else {
          val idf = math.log(1.0 + (n.toDouble - dfT(t) + 0.5) / (dfT(t) + 0.5))
          idf * tf / (tf + 1.2 * (0.25 + 0.75 * ws.length / avgdl))
        }
      }.sum
      if (sc > 0) Some(id -> sc) else None
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (id, sc) =>
      assert(math.abs(got(id) - sc) < 1e-6, s"doc $id: ${got(id)} vs $sc")
    }
  }

  test("keywordsTfIdf: rare repeated terms outrank common ones, hapax " +
    "dropped by minDf, scores are exact integer micro-nats") {
    val s = spark
    import s.implicits._
    // "common" in all 4 docs (idf=0), "rare" in 2, "once" in 1 (hapax)
    val docs = Seq(
      (1L, "common rare rare rare once common"),
      (2L, "common rare common"),
      (3L, "common filler filler"),
      (4L, "common filler")).toDF("doc_id", "text")
    val got = TextFunctions.keywordsTfIdf(docs, "doc_id", "text",
      k = 2, minDf = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1)
    def idfMicro(df: Long): Long = math.round(math.log(4.0 / df) * 1e6)
    // doc 1: rare tf=3 scores 3·ln(4/2)µ, common tf=2 scores 0 (idf ln1);
    // "once" (df=1) must be absent entirely
    val d1 = got(1L).sortBy(_._5)
    assert(d1.map(t => (t._2, t._3, t._4)).toSeq == Seq(
      ("rare", 3L, 3 * idfMicro(2)), ("common", 2L, 0L)))
    assert(!got.values.flatten.exists(_._2 == "once"))
    // doc 3: filler (df=2) outranks common (idf 0); exact scores
    val d3 = got(3L).sortBy(_._5)
    assert(d3.map(t => (t._2, t._4)).toSeq == Seq(
      ("filler", 2 * idfMicro(2)), ("common", 0L)))
    // k caps per doc
    assert(got.values.forall(_.length <= 2))
  }

  test("bm25 ranks exact term matches by tf saturation and rarity") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "rare filler filler filler filler"),
      (4L, "filler filler filler filler filler")).toDF("doc_id", "text")
    val got = TextFunctions.bm25(docs, "doc_id", "text",
      Seq("spark", "rare"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 4 has no query term → absent
    assert(got.keySet == Set(1L, 2L, 3L))
    // more tf → higher score for the same term
    assert(got(1L) > got(2L))
    // "rare" (df=1) outscores a single "spark" (df=2) at equal tf/dl
    assert(got(3L) > got(2L))
    // hand-check doc 2: idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2);
    // dl = 5 = avgdl → denom = 1 + 1.2
    val expect2 = math.log(2.0) * 1.0 / (1.0 + 1.2)
    assert(math.abs(got(2L) - expect2) < 1e-6)
  }

  test("pcaPowerDirection finds the dominant axis with exact integer scores") {
    val s = spark
    import s.implicits._
    // variance concentrated on axis 0 (±1), light noise on axis 1
    val rows = (0 until 200).map { i =>
      val sgn = if (i % 2 == 0) 1f else -1f
      val noise = if (i % 3 == 0) 0.1f else -0.1f
      (i.toLong, Seq(sgn, noise, 0f, 0f))
    }
    val df = rows.toDF("id", "vec")
    val dir = Similarity.pcaPowerDirection(df, "vec", dim = 4, iters = 4)
    assert(math.abs(dir(0)) > 990000L, s"axis-0 must dominate: ${dir.toSeq}")
    assert(math.abs(dir(1)) < 300000L, s"noise axis must shrink: ${dir.toSeq}")
    assert(dir(2) == 0L && dir(3) == 0L)
    // scores are the exact integer dot with the int8 codes — replicate
    // the quantization by hand for a few rows
    val scores = Similarity.pcaScores(df, "id", "vec", dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(6).foreach { case (id, v) =>
      val q = v.map(x => math.max(-127L, math.min(127L, math.round(x * 127.0))))
      val expect = q.zip(dir).map { case (a, b) => a * b }.sum
      assert(scores(id) == expect, s"exact score mismatch at $id")
    }
    // deterministic across runs (distributed sums are exact integers)
    val dir2 = Similarity.pcaPowerDirection(df, "vec", dim = 4, iters = 4)
    assert(dir.toSeq == dir2.toSeq)
  }

  test("bloom decontamination never misses an exact hit; probe is join-free") {
    val corpus = docs.filter(col("source") =!= "bench")
    val bench = docs.filter(col("source") === "bench")
    val exact = Decontaminate.overlapHits(corpus, bench, "text", "doc_id",
      n = 5, minHits = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bits = Decontaminate.benchBloom(bench, "text", n = 5,
      mBits = 1 << 16, k = 5)
    val probe = Decontaminate.bloomOverlapHits(corpus, bits,
      "text", "doc_id", n = 5, k = 5, minHits = 1)
    val bloom = probe.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exact hit appears with >= its evidence
    exact.foreach { case (id, hits) =>
      assert(bloom.contains(id) && bloom(id) >= hits,
        s"bloom lost doc $id: exact=$exact bloom=$bloom")
    }
    // the probe never joins — the bit array rides the plan as a literal
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "bloom probe must be join-free")
  }
}
