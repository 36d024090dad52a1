package graft.ext

import graft.SparkSpec
import graft.functions.SimHash64
import org.apache.spark.sql.functions._

class PipelineExtSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "der hund ist nicht ein katze und das ist gut"),
      (4L, "le chat est dans la maison et la porte est ouverte"),
      (5L, "completely different words about spark query engines"),
      (6L, "the quick brown fox jumps over the lazy dog")) // dup of 1
      .toDF("doc_id", "text")
  }

  test("langId picks the dominant marker language") {
    val out = docs.select(col("doc_id"),
      TextFunctions.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(3L) == "de")
    assert(out(4L) == "fr")
  }

  test("shingles produce n-grams; short texts yield none") {
    val s = spark
    import s.implicits._
    val out = Seq((1L, "a b c d"), (2L, "one two"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)
  }

  test("exact dedup groups duplicates under one fingerprint") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id")
      .filter(col("cnt") > 1).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keeper") == 1L)
    assert(groups(0).getAs[Long]("cnt") == 2L)
  }

  test("ngram jaccard finds the near-dup pair, minhash LSH agrees") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1~2 near dups, 1~6 and 2~6 exact/near dups
    assert(exact.contains((1L, 2L)) && exact.contains((1L, 6L)))
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 0.5,
      numPerms = 64, bands = 32) // 32 bands x 2 rows: catches j>=0.5 pairs
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("LSH exact-set collapse is lossless: dup-heavy corpus ≡ brute force") {
    val s = spark
    import s.implicits._
    // five exact copies (one shingle set banding once), a rotation pair
    // (same shingle SET, different text — collapse must key on the set,
    // not the text), a near-dup of the copies (cross-set expansion must
    // fan its rep pair out to every member), and an unrelated doc
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "the quick brown fox jumps over the lazy dog tonight"),
      (12L, "the quick brown fox jumps over the lazy dog tonight"),
      (13L, "the quick brown fox jumps over the lazy dog tonight"),
      (14L, "the quick brown fox jumps over the lazy dog tonight"),
      (20L, "a b c a b c"),
      (21L, "b c a b c a"),
      (30L, "the quick brown fox jumps over the lazy cat tonight"),
      (40L, "completely unrelated words about spark query engines"))
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    val brute = pairSet(
      Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5))
    val lsh = pairSet(
      Dedup.minhashLshPairs(corpus, "text", "doc_id", 3, 0.5,
        numPerms = 64, bands = 32))
    assert(lsh == brute)
    // the rotation pair is same-SET: emitted by the within path at 1.0
    assert(lsh.exists(p => p._1 == 20L && p._2 == 21L && p._3 == BigDecimal(1)))
    // all C(5,2)=10 copy pairs at 1.0, and 30 pairs with every copy
    assert(lsh.count(p => p._1 >= 10L && p._2 <= 14L) == 10)
    assert(lsh.count(p => p._1 <= 14L && p._2 == 30L) == 5)
    // doomed primitive ≡ pairs' higher-id set
    val doomed = Dedup.minhashLshDoomed(corpus, "text", "doc_id", 3, 0.5,
      numPerms = 64, bands = 32)
      .collect().map(_.getLong(0)).toSet
    val fromPairs = lsh.map(_._2)
    assert(doomed == fromPairs)
  }

  test("simhash: identical docs collide, near-dups are close, rest far") {
    val sh = Dedup.simhashes(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(6L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(5L)))
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 6L)))
  }

  test("SimHash64 expression matches the reference computation") {
    val s = spark
    import s.implicits._
    val hashes = Seq(0x0F0FL, 0xF0F0L, 0x0F0FL)
    val viaSpark = Seq(Tuple1(hashes)).toDF("h")
      .select(SimHash64(col("h"))).head().getLong(0)
    assert(viaSpark == SimHash64.compute(hashes.toArray))
  }

  test("cosine similarity and top-k neighbors") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", 2)
      .orderBy("rn").collect()
    assert(top.map(_.getAs[Long]("nid")).toSeq == Seq(2L, 3L))
    val ivf = Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", "label", 2).collect()
    assert(ivf.map(_.getAs[Long]("nid")).toSeq == Seq(2L)) // cell-restricted
  }

  private def pairEmb = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f, 0.0f), 0),  // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.99f, 0.14f), 1),  // near-dup of 3
      (5L, Array(0.0f, 0.0f, 1.0f), 0),
      (6L, Array(1.0f, 0.0f, 0.0f), 1))    // dup of 1, other block
      .toDF("vec_id", "embedding", "label")
  }

  test("ShingleHashes equals xxhash64 over string shingles, byte-for-byte") {
    val out = docs.select(col("doc_id"),
      graft.functions.ShingleHashes(TextFunctions.tokens(col("text")), 3)
        .as("native"),
      transform(TextFunctions.shingles(col("text"), 3),
        s => xxhash64(s)).as("viaStrings"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
    // short text → empty array, same as the string path
    val s = spark
    import s.implicits._
    val short = Seq((1L, "one two")).toDF("id", "text")
      .select(graft.functions.ShingleHashes(
        TextFunctions.tokens(col("text")), 3).as("h"))
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("asOfBucketed equals asOf across bucket boundaries and empty buckets") {
    val s = spark
    import s.implicits._
    // right rows scattered so some left rows match in-bucket, some need
    // the carry-in across one or more EMPTY buckets, some have no match
    val right = Seq(
      (1L, 5L, "a"), (1L, 95L, "b"),    // bucket 0
      (1L, 450L, "c"),                  // bucket 4 (1-3 empty)
      (2L, 205L, "x"))                  // bucket 2
      .toDF("k", "ts", "v")
    val left = Seq(
      (1L, 3L),    // before any right row → null
      (1L, 97L),   // in-bucket match (b)
      (1L, 120L),  // bucket 1 empty → carry-in (b)
      (1L, 430L),  // bucket 4, before 450 → carry-in (b)
      (1L, 460L),  // in-bucket match (c)
      (2L, 300L),  // bucket 3 empty → carry-in (x)
      (3L, 50L))   // unknown key → null
      .toDF("k", "ts")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ts", "pv").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    val plain = norm(AsOfJoin.asOf(left, right, Seq("k"), "ts",
      Seq("v" -> "pv")))
    val bucketed = norm(AsOfJoin.asOfBucketed(left, right, Seq("k"), "ts",
      Seq("v" -> "pv"), bucketWidth = 100L))
    assert(bucketed == plain, s"bucketed=$bucketed plain=$plain")
    assert(plain.contains((1L, 120L, Some("b"))) &&
      plain.contains((2L, 300L, Some("x"))) &&
      plain.contains((3L, 50L, None)))
  }

  test("range join: equi-join plan, equals the brute-force inequality join") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 1L, 50L), (2L, 1L, 250L), (3L, 2L, 50L),
      (4L, 1L, 1000L)).toDF("pid", "k", "p")
    val intervals = Seq((10L, 1L, 40L, 60L), (11L, 1L, 45L, 260L),
      (12L, 2L, 100L, 200L), (13L, 1L, 999L, 999L)).toDF("iid", "k", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals,
      "p", "s", "e", keys = Seq("k"), binWidth = 100L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = out.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.as("a").join(intervals.as("b"),
        col("a.k") === col("b.k") &&
          col("a.p") >= col("b.s") && col("a.p") <= col("b.e"))
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute && got == Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("asOf carries the latest right row atomically when it holds NULLs") {
    val s = spark
    import s.implicits._
    // user 1: price at t=1 is (10.0, "usd"); at t=2 price is NULL but
    // currency changes to "eur". A left row at t=3 must see the t=2 row
    // whole — (null, "eur") — never a torn (10.0, "eur").
    val right = Seq(
      (1L, 1L, Option(10.0), Option("usd")),
      (1L, 2L, Option.empty[Double], Option("eur")))
      .toDF("uid", "ts", "price", "ccy")
    val left = Seq((1L, 3L)).toDF("uid", "ts")
    val out = AsOfJoin.asOf(left, right, Seq("uid"), "ts",
      Seq("price" -> "p", "ccy" -> "c")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("p")))
    assert(out.head.getString(out.head.fieldIndex("c")) == "eur")
  }

  test("cosinePairs small path: exact pairs, no cartesian, no driver collect") {
    val out = Similarity.cosinePairs(pairEmb, "vec_id", "embedding", 0.95)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val pairs = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L), (1L, 6L), (2L, 6L)))
  }

  test("cosinePairs blocked path: exact within blocks, equi-join plan") {
    val out = Similarity.cosinePairs(pairEmb, "vec_id", "embedding", 0.95,
      blockCol = Some("label"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val pairs = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,6) crosses blocks — by contract not a candidate
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("cosinePairs srp auto-block: verified subset of brute force, finds dups") {
    val brute = Similarity.cosinePairs(pairEmb, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // broadcastLimit=2 forces the SRP-blocked path on the 6-row fixture;
    // the approximate fallback is opt-in — without allowApprox the
    // oversized unblocked corpus must fail fast
    intercept[IllegalArgumentException] {
      Similarity.cosinePairs(pairEmb, "vec_id", "embedding", 0.95,
        broadcastLimit = 2L)
    }
    val srp = Similarity.cosinePairs(pairEmb, "vec_id", "embedding", 0.95,
      broadcastLimit = 2L, allowApprox = true)
    val plan = srp.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val pairs = srp.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair is exact-verified; identical vectors share every
    // SRP cell, so (1,6) is always found
    assert(pairs.subsetOf(brute))
    assert(pairs.contains((1L, 6L)))
  }

  test("srp_bands is deterministic and dimension-safe") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Tuple1(Array(0.3f, -0.2f, 0.9f)),
      Tuple1(Array(0.3f, -0.2f, 0.9f)),
      Tuple1(Array(0.3f, -0.2f))) // shorter vector: no exception
      .toDF("v")
    val cells = df.select(graft.functions.SrpBands(col("v"), 8, 4, 42L))
      .collect().map(_.getSeq[Long](0))
    assert(cells(0) == cells(1))
    assert(cells(0).length == 4)
    assert(cells(2).length == 4)
  }

  test("materialized IVF index prunes cell partitions dynamically") {
    val s = spark
    import s.implicits._
    val emb = (1L to 50L).map(i =>
      (i, Array.tabulate(4)(j => (i + j).toFloat), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", "label", idx)
    // the stats heuristic would skip DPP on a 50-row fixture; disable it
    // so the plan shape (not the benefit estimate) is what's asserted —
    // at real scale the benefit check passes on its own (PLANS.md)
    val key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val saved = s.conf.get(key)
    // query side parquet-backed, as in real usage (a LocalRelation build
    // side is not eligible for DPP filter insertion)
    val qSide = s.read.parquet(idx).filter(col("vec_id") === 1)
    val plan = try {
      s.conf.set(key, "false")
      Similarity.ivfTopKIndexed(s, idx, qSide,
        "vec_id", "embedding", "label", 3)
        .queryExecution.executedPlan.toString
    } finally s.conf.set(key, saved)
    // the corpus scan must carry a dynamic-pruning partition filter on
    // the cell column — only queried cells' directories are read
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    val out = Similarity.ivfTopKIndexed(s, idx,
      emb.filter(col("vec_id") === 1), "vec_id", "embedding", "label", 3)
    val expect = Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", "label", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == expect)
  }

  test("incremental embedding probe prunes history cell partitions and " +
    "equals the blocked batch pairs restricted to the increment") {
    val s = spark
    import s.implicits._
    val emb = (1L to 60L).map(i =>
      (i, Array.tabulate(4)(j => (i * 3 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val hist = emb.filter(col("vec_id") % 2 === 1)
    val inc = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 10)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_embinc_spec").toString
    val cents = Similarity.trainCentroids(hist, "vec_id", "embedding", 5)
    Similarity.buildIvfIndex(hist, "vec_id", "embedding", cents, idx)
    val plan = Similarity.cosinePairsIncremental(s, idx, inc,
      "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    // the history scan must carry a STATIC partition filter on the cell
    // column (the increment's distinct probe cells) — directories of
    // cells the increment never probes are never listed or read
    assert(plan.contains("PartitionFilters") && plan.contains("__cell"),
      plan)
    // semantics: cell-blocked pairs over history ∪ increment, restricted
    // to increment-touching pairs
    val corpus = hist.unionAll(inc)
    val celled = Similarity.assignCells(corpus, "embedding", "cell", cents)
    val full = Similarity.cosinePairs(celled, "vec_id", "embedding", 0.9,
      blockCol = Some("cell"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val incIds = inc.select("vec_id").collect().map(_.getLong(0)).toSet
    val expect = full.filter(p => incIds(p._1) || incIds(p._2))
    val got = Similarity.cosinePairsIncremental(s, idx, inc,
      "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"got $got, expected $expect")
    assert(got.nonEmpty)
  }

  test("salted joins preserve exact join semantics") {
    val s = spark
    import s.implicits._
    // one hot key (90% of rows) + cold tail
    val skewed = (Seq.fill(900)(1) ++ (2 to 101)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "payload")
    val small = (1 to 101).map(k => (k, s"dim_$k")).toDF("k", "name")
    val expected = skewed.join(small, "k")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val viaSalted = SkewJoin.salted(skewed, small, "k", factor = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val viaDegree = SkewJoin.saltedByDegree(skewed, small, "k",
      factor = 8, hotThreshold = 100)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(viaSalted == expected)
    assert(viaDegree == expected)
  }

  test("hot-shingle cap drops quadratic shingles, keeps exact-set pairs") {
    val s = spark
    import s.implicits._
    val uncapped = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5,
      maxShingleFreq = None)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap of 1 suppresses every shingle shared by >1 DISTINCT set, so
    // the cross-set near-dup pair (1,2) disappears — but the exact-dup
    // pair (1,6) survives: identical sets pair through the within path
    // without candidate shingles (the r9 recall fix — at doc
    // granularity the cap silently dropped exact duplicates of any
    // page hotter than the cap)
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5,
      maxShingleFreq = Some(1))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((1L, 6L)))
    assert(!capped.contains((1L, 2L)))
    assert(capped.contains((1L, 6L)))
    // the default cap (1000) is inert on this corpus
    val defaulted = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaulted == uncapped)
  }

  test("jaccard set collapse: hot-copy group above the cap still pairs") {
    val s = spark
    import s.implicits._
    // 8 verbatim copies of one page — hotter than cap=5. Pre-r9, every
    // shingle of the page exceeded the cap, so its copies produced ZERO
    // pairs; collapsed, the page contributes one row per shingle and
    // the within path emits all C(8,2) pairs at exactly 1.0
    val copies = (0 until 8).map(i =>
      (100L + i, "the quick brown fox jumps over the lazy dog tonight"))
    val corpus = (copies ++ Seq(
      (200L, "the quick brown fox jumps over the lazy cat tonight"),
      (300L, "completely unrelated words about spark query engines")))
      .toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5,
      maxShingleFreq = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5,
      maxShingleFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // no shingle spans >5 DISTINCT sets here, so the rep-granularity
    // cap is inert and capped ≡ brute force — including the 28 copy
    // pairs at 1.0 and the 8 near-dup pairs against doc 200
    assert(capped == brute)
    assert(capped.count(p => p._1 >= 100L && p._2 < 200L && p._3 == 1.0) == 28)
    assert(capped.count(p => p._2 == 200L) == 8)
    // exact row-count discipline: the member expansion must not
    // duplicate any pair
    val all = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5,
      maxShingleFreq = Some(5)).collect()
    assert(all.length == all.map(r => (r.getLong(0), r.getLong(1))).toSet.size)
  }

  test("jaccard cluster edges close to the same components as member pairs") {
    val s = spark
    import s.implicits._
    // a hot verbatim-copy group (100..104), a near-dup bridge (200
    // links to the group's content), and unrelated singletons
    val corpus = ((100 until 105).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog tonight")) ++ Seq(
      (200L, "the quick brown fox jumps over the lazy cat tonight"),
      (300L, "completely unrelated words about spark query engines"),
      (301L, "another disjoint document speaking of graphs and joins")))
      .toDF("doc_id", "text")
    def labels(edgeSrc: org.apache.spark.sql.DataFrame) =
      Dedup.resolveClusters(edgeSrc, corpus, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5,
      maxShingleFreq = None)
    val edges = Dedup.ngramJaccardClusterEdges(corpus, "text", "doc_id",
      3, 0.5, maxShingleFreq = None)
    assert(labels(edges) == labels(pairs))
    // the star graph is linear in duplicates where the clique is
    // quadratic: 4 stars + rep-level pairs, vs C(5,2) within pairs alone
    val edgeCount = edges.count()
    assert(edgeCount < pairs.count())
    assert(labels(edges)(104L) == 100L && labels(edges)(200L) == 100L)
    // degenerate tau > 1: stars must not connect what pairs would not
    val edgesHi = Dedup.ngramJaccardClusterEdges(corpus, "text", "doc_id",
      3, 1.5, maxShingleFreq = None)
    assert(edgesHi.count() == 0)
  }

  test("salted adjacency aggregation equals the single-shuffle build") {
    import graft.graph.GraphBuilder
    import graft.meta.EdgeAttr
    val s = spark
    import s.implicits._
    // hub node 1 with 500 out-edges + cold tail
    val pairs = ((1 to 500).map(i => (1L, 100L + i, i.toDouble)) ++
      Seq((2L, 3L, 0.5), (3L, 4L, 0.25)))
      .toDF("src", "sink", "w")
    val attrs = Seq(EdgeAttr("w", org.apache.spark.sql.types.DoubleType))
    val plain = GraphBuilder.adjacency(pairs, attrs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val salted = GraphBuilder.adjacency(pairs, attrs, saltFactor = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(salted == plain) // identical arrays incl. edgeId numbering
  }

  test("curation pipeline: gate, exact dedup, near dedup, annotate") {
    val out = Pipeline.curate(docs, "text", "doc_id",
      minQuality = 0.0, nearDedup = true, minJaccard = 0.5)
    // 6 is an exact dup of 1; 2 is a near dup of 1 at j>=0.5 → both drop
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 4L, 5L))
    val row1 = out.filter(col("doc_id") === 1).head()
    assert(row1.getAs[String]("lang_id") == "en")
    assert(row1.getAs[Int]("token_cnt") == 9)
  }

  test("multimodal stub decode: batch plumbing is deterministic") {
    val s = spark
    import Multimodal._
    val rows = (1L to 150L).map(i =>
      MediaRow(i, Array.tabulate(16)(j => ((i + j) % 251).toByte), "image/fake"))
    val ds = s.createDataset(rows)(mediaRowEnc).repartition(3)
    val out = Multimodal.decodeMeta(ds).collect().map(m => m.id -> m).toMap
    assert(out.size == 150)
    val m1 = out(1L)
    assert(m1.byteLen == 16)
    // content bytes are (1,2,3,...): b0=1, b1=2, b2=3
    assert(m1.width == 1 + ((1 * 256 + 2) % 1024))
    assert(m1.height == 1 + ((2 * 256 + 3) % 768))
    assert(m1.digest == Multimodal.md5Hex(rows.head.content))
    assert(Multimodal.sampleFrames(m1).nonEmpty)
  }

  test("real image decode reads true dimensions, color, and survives " +
    "corrupt payloads; resize preserves solid color") {
    val s = spark
    import s.implicits._
    import Multimodal._
    val rows = Seq(
      MediaRow(7L, Multimodal.syntheticPng(7L), "image/png"),
      MediaRow(8L, Array[Byte](1, 2, 3, 4), "image/png")) // corrupt
    val meta = Multimodal.decodeImages(rows.toDS())
      .collect().map(m => m.id -> m).toMap
    assert(meta(7L).width == 8 && meta(7L).height == 6)
    assert(meta(7L).format == "png")
    assert(meta(7L).avgR == (7 * 37 % 256).toDouble)
    assert(meta(7L).avgG == (7 * 91 % 256).toDouble)
    assert(meta(7L).avgB == (7 * 53 % 256).toDouble)
    // corrupt payload quarantines instead of throwing
    assert(meta(8L).width == -1 && meta(8L).format == "unknown")
    // bilinear resize of a solid color is the same color at 4x3
    val resized = Multimodal.decodeImages(
      Multimodal.resizeImages(rows.toDS(), 4, 3))
      .collect().map(m => m.id -> m).toMap
    assert(resized(7L).width == 4 && resized(7L).height == 3)
    assert(resized(7L).avgR == (7 * 37 % 256).toDouble)
    // corrupt rows pass through the resize unchanged
    assert(resized(8L).width == -1)
  }

  test("dHash groups perceptual duplicates and is re-encoding robust") {
    val s = spark
    import s.implicits._
    import Multimodal._
    // ids 0..7: phases 0..3 twice over; 100 is corrupt
    val rows = (0L to 7L).map(id =>
      MediaRow(id, Multimodal.syntheticPatternPng(id), "image/png")) :+
      MediaRow(100L, Array[Byte](0, 1), "image/png")
    val hashes = Multimodal.dHashes(rows.toDS())
      .collect().map(h => h.id -> h.dhash).toMap
    // same phase → same hash; the four phases are pairwise distinct
    assert((0L to 3L).forall(i => hashes(i) == hashes(i + 4)))
    assert((0L to 3L).map(hashes).toSet.size == 4)
    assert(hashes(100L) == -1L)
    // a resized re-encode keeps its perceptual hash (scale up 3x)
    val big = Multimodal.resizeImages(
      rows.take(1).toDS(), 27, 24)
    val rehash = Multimodal.dHashes(big).collect().head.dhash
    assert(rehash == hashes(0L))
    // grouping: keeper = min id per phase, corrupt rows excluded
    val groups = Multimodal.dHashGroups(rows.toDS())
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(groups == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("audio fingerprints group by energy pattern and ignore gain") {
    val s = spark
    import s.implicits._
    import Multimodal._
    val rows = (0L to 7L).map(id =>
      MediaRow(id, Multimodal.syntheticPatternWav(id), "audio/wav")) :+
      MediaRow(100L, Array[Byte](1), "audio/wav")
    val fps = Multimodal.audioFingerprints(rows.toDS())
      .collect().map(h => h.id -> h.dhash).toMap
    assert((0L to 3L).forall(i => fps(i) == fps(i + 4)))
    assert((0L to 3L).map(fps).toSet.size == 4)
    assert(fps(100L) == -1L)
    val groups = Multimodal.audioFingerprintGroups(rows.toDS())
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(groups == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("mp4 demux walks boxes for duration and dimensions; malformed " +
    "payloads quarantine") {
    val s = spark
    import s.implicits._
    import Multimodal._
    val rows = Seq(
      MediaRow(3L, Multimodal.syntheticMp4(3L), "video/mp4"),
      MediaRow(9L, Array[Byte](0, 0, 0, 1), "video/mp4"))
    val meta = Multimodal.demuxMp4(rows.toDS())
      .collect().map(m => m.id -> m).toMap
    assert(meta(3L).brand == "isom")
    assert(meta(3L).timescale == 1000L)
    assert(meta(3L).durationMs == 1000 + (3 % 60) * 500)
    assert(meta(3L).width == 160 + (3 % 8) * 16)
    assert(meta(3L).height == 120 + (3 % 6) * 16)
    assert(meta(9L).brand == "" && meta(9L).durationMs == -1L)
  }

  test("real MJPEG-AVI frame decode: RIFF walk + per-frame JPEG decode; " +
    "malformed containers quarantine") {
    val s = spark
    import s.implicits._
    import Multimodal._
    // adversarial container: RIFF chunk size near 2^32 wraps negative as
    // an Int — must quarantine, not escape as an uncaught exception
    val evil = {
      val bos = new java.io.ByteArrayOutputStream()
      def cc(t: String): Unit = bos.write(t.getBytes("ISO-8859-1"))
      def u32(v: Long): Unit =
        (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xFF).toInt))
      cc("RIFF"); u32(0xFFFFFFF0L); cc("AVI ")
      cc("LIST"); u32(0xFFFFFFF0L); cc("movi")
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(7L, Multimodal.syntheticAviMjpeg(7L), "video/x-msvideo"),
      MediaRow(9L, Array[Byte]('R', 'I', 'F', 'F', 1, 0, 0, 0),
        "video/x-msvideo"),
      MediaRow(11L, evil, "video/x-msvideo"))
    val frames = Multimodal.decodeAviFrames(rows.toDS()).collect()
    val ok = frames.filter(_.id == 7L).sortBy(_.frameIdx)
    assert(ok.length == 1 + (7 % 5)) // frame-count formula
    ok.zipWithIndex.foreach { case (f, i) =>
      assert(f.frameIdx == i)
      assert(f.width == 64 + (7 % 4) * 16 && f.height == 48 + (7 % 3) * 16)
      assert(f.lumaBucket == ((7 * 7 + i * 3) % 16).toInt,
        s"frame $i decoded luma bucket ${f.lumaBucket}")
    }
    val bad = frames.filter(_.id == 9L)
    assert(bad.map(f => (f.frameIdx, f.width)).toSeq == Seq((-1, -1)))
    val adversarial = frames.filter(_.id == 11L)
    assert(adversarial.map(f => (f.frameIdx, f.width)).toSeq == Seq((-1, -1)))
  }

  test("video near-dup: frame-dHash-set fingerprints group re-encoded/" +
    "padded striped AVIs by content class") {
    val s = spark
    import s.implicits._
    import Multimodal._
    // ids 0..7 → phases 0..3 twice, where the second occurrence differs
    // in frame count, resolution (72 vs 144 wide) and JUNK padding;
    // id 99 is a corrupt container → quarantined out of the groups
    val rows = (0L until 8L).map(id =>
      MediaRow(id, Multimodal.syntheticPatternAvi(id), "video/x-msvideo")) :+
      MediaRow(99L, Array[Byte]('R', 'I', 'F', 'F', 9, 9), "video/x-msvideo")
    val groups = Multimodal.videoFingerprintGroups(rows.toDS())
      .select(col("keeper"), col("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(groups.toSeq == Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L)))
    // within one video every frame shares the dHash (same striped
    // pattern per frame), and phases give 4 distinct hashes
    val hashes = Multimodal.videoFrameHashes(rows.take(8).toDS())
      .collect().filter(_.frameIdx >= 0)
    assert(hashes.groupBy(_.id).forall(_._2.map(_.dhash).distinct.size == 1))
    assert(hashes.map(_.dhash).distinct.length == 4)
  }

  test("raw BI_RGB AVI decode: exact dimensions and luma formula, " +
    "bottom-up stride rows, no codec involved") {
    val s = spark
    import s.implicits._
    import Multimodal._
    val rows = (0L until 12L).map(id =>
      MediaRow(id, Multimodal.syntheticAviRaw(id), "video/x-msvideo"))
    val frames = Multimodal.decodeAviFrames(rows.toDS()).collect()
    assert(frames.forall(_.frameIdx >= 0), "raw frames must all decode")
    frames.foreach { f =>
      assert(f.width == 64 + (f.id % 4).toInt * 16)
      assert(f.height == 48 + (f.id % 3).toInt * 16)
      // raw path: the bucket is the EXACT formula — no JPEG tolerance
      assert(f.lumaBucket == ((f.id * 7 + f.frameIdx * 3) % 16).toInt,
        s"luma bucket mismatch at $f")
    }
    assert(frames.groupBy(_.id).forall { case (id, fs) =>
      fs.length == 1 + (id % 5).toInt
    })
  }

  test("video near-dup groups the same content ACROSS codecs: raw " +
    "BI_RGB variants join their MJPEG twins' groups") {
    val s = spark
    import s.implicits._
    import Multimodal._
    // ids 0..7: MJPEG striped phases 0..3 at both scales; ids 8..15:
    // the SAME content classes as uncompressed BI_RGB (phase = id%4,
    // scales again) — one group per phase spanning both codecs
    val rows = (0L until 8L).map(id =>
      MediaRow(id, Multimodal.syntheticPatternAvi(id), "video/x-msvideo")) ++
      (8L until 16L).map(id =>
        MediaRow(id, Multimodal.syntheticPatternAviRaw(id), "video/x-msvideo"))
    val groups = Multimodal.videoFingerprintGroups(rows.toDS())
      .select(col("keeper"), col("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(groups.toSeq == Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L)),
      s"cross-codec groups: ${groups.toSeq}")
  }

  test("video near-dup: a PARTIALLY corrupt video is quarantined, not " +
    "grouped via its decodable-subset signature") {
    val s = spark
    import s.implicits._
    import Multimodal._
    // id 4 is the phase-0 twin of id 0 (2 frames); corrupt the SECOND
    // 00dc chunk's JPEG payload so one frame still decodes — its subset
    // signature would equal id 0's, the exact grouping the quarantine
    // must prevent
    val partial = Multimodal.syntheticPatternAvi(4L)
    val tag = "00dc".getBytes("ISO-8859-1")
    def find(from: Int): Int = partial.indexOfSlice(tag, from)
    val second = find(find(0) + 1)
    assert(second > 0, "fixture needs two frame chunks")
    (0 until 4).foreach(i => partial(second + 8 + i) = 0)
    val rows = (0L until 8L).map { id =>
      val b = if (id == 4L) partial else Multimodal.syntheticPatternAvi(id)
      MediaRow(id, b, "video/x-msvideo")
    }
    // id 4 emitted one good frame AND a sentinel → quarantined, so the
    // phase-0 group keeps only id 0
    val frames4 = Multimodal.videoFrameHashes(rows.filter(_.id == 4L).toDS())
      .collect()
    assert(frames4.exists(_.frameIdx >= 0) && frames4.exists(_.frameIdx < 0))
    val groups = Multimodal.videoFingerprintGroups(rows.toDS())
      .select(col("keeper"), col("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(groups.toSeq == Seq((0L, 1L), (1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("real audio decode reads rate, frames, and exact square-wave " +
    "statistics; corrupt payloads quarantine") {
    val s = spark
    import s.implicits._
    import Multimodal._
    val rows = Seq(
      MediaRow(4L, Multimodal.syntheticWav(4L), "audio/wav"),
      MediaRow(5L, Array[Byte](9, 9, 9), "audio/wav"))
    val meta = Multimodal.decodeAudio(rows.toDS())
      .collect().map(m => m.id -> m).toMap
    val v = (1 + 4 % 9) * 3000 // amplitude formula for id 4
    assert(meta(4L).sampleRate == 8000 && meta(4L).channels == 1)
    assert(meta(4L).frames == 800 + (4 % 5) * 80)
    assert(meta(4L).rms == v.toDouble / 32768.0)   // square wave: exact
    assert(meta(4L).peak == v.toDouble / 32768.0)
    assert(meta(5L).sampleRate == -1)
  }

  test("BPE training learns the hand-computable merge sequence; " +
    "bpeTokens segments with it") {
    val s = spark
    import s.implicits._
    // vocab: "aaab" f=2. Round 1: pairs (a,a)x2 -> 4, (a,b) -> 2: merge
    // (a,a). State [aa,a,b]. Round 2: (aa,a)=2, (a,b)=2 tie -> lexical
    // (a,b) wins. State [aa,ab]. Round 3: (aa,ab)=2.
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab aaab")).toDF("doc_id", "text")
    val merges = TextFunctions.trainBpeMerges(docs, "text", rounds = 3)
    assert(merges == Seq(("a", "a", 8L), ("a", "b", 4L), ("aa", "ab", 4L)))
    // adjacent same-pair runs merge left-to-right non-overlapping:
    // after round 1 only, "aaaa" would be [aa, aa] — verify via the
    // 2-rule prefix on a fresh word
    val twoRules = merges.take(2).map(m => (m._1, m._2))
    val seg = Seq(Tuple1("aaaa aaab"))
      .toDF("text")
      .select(TextFunctions.bpeTokens(col("text"), twoRules).as("t"))
      .head().getSeq[String](0)
    assert(seg == Seq("aa", "aa", "aa", "ab"))
    // full rules collapse the training word to one symbol
    val seg3 = Seq(Tuple1("aaab"))
      .toDF("text")
      .select(TextFunctions.bpeTokens(col("text"),
        merges.map(m => (m._1, m._2))).as("t"))
      .head().getSeq[String](0)
    assert(seg3 == Seq("aaab"))
    // exhaustion: more rounds than mergeable pairs stops early
    val small = Seq((1L, "ab")).toDF("doc_id", "text")
    val ex = TextFunctions.trainBpeMerges(small, "text", rounds = 5)
    assert(ex == Seq(("a", "b", 1L)))
  }

  test("incremental simhash against a persisted fingerprint index equals " +
    "the full join restricted to increment-touching pairs") {
    val s = spark
    import s.implicits._
    val hist = docs.filter(col("doc_id") < 6)
    val inc = docs.filter(col("doc_id") === 6)
    val idx = java.nio.file.Files
      .createTempDirectory("sh_idx_spec").toString
    Dedup.writeSimhashIndex(hist, "text", "doc_id", idx)
    val got = Dedup.simhashPairsIncremental(s, inc, idx,
      "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 == 6L || p._2 == 6L)
    assert(got == full)
    assert(got.contains((1L, 6L))) // the exact copy: hamming 0 via index
  }

  test("simhash with a dup-heavy increment and replay: collapse " +
    "expansion equals the full join, duplicate-free") {
    val s = spark
    import s.implicits._
    val page = "the quick brown fox jumps over the lazy dog tonight"
    val near = "the quick brown fox jumps over the lazy cat tonight"
    val hist = Seq(
      (1L, page), (2L, page),
      (3L, "completely unrelated words about spark query engines"))
      .toDF("doc_id", "text")
    val inc = Seq(
      (10L, page), (11L, page), (12L, page), (13L, near),
      (2L, page)) // replay: id 2 is in the index AND the increment
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("sh_idx_dup_spec").toString
    Dedup.writeSimhashIndex(hist, "text", "doc_id", idx)
    val gotRows = Dedup.simhashPairsIncremental(s, inc, idx,
      "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = gotRows.toSet
    assert(gotRows.length == got.size) // no-final-distinct contract
    val incIds = Set(10L, 11L, 12L, 13L, 2L)
    val full = Dedup.simhashPairs(
      hist.unionByName(inc.filter(col("doc_id") =!= 2L)),
      "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => incIds(p._1) || incIds(p._2))
    assert(got == full)
    assert(got.forall(p => (incIds(p._1) || incIds(p._2)) && p._1 != p._2))
    // identical-fingerprint cluster found via index AND within increment
    assert(Seq((1L, 10L), (2L, 10L), (10L, 11L)).forall(got.contains))
    // batch operator emits each pair once on a copy-heavy corpus
    val batchRows = Dedup.simhashPairs(
      hist.unionByName(inc.filter(col("doc_id") =!= 2L)),
      "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(batchRows.length == batchRows.toSet.size)
  }

  test("incremental LSH against a persisted band index equals the full " +
    "join restricted to increment-touching pairs") {
    val s = spark
    import s.implicits._
    // history 1..5 (6 is the increment; near-dups: 6~1 exact, 2~1 high)
    val hist = docs.filter(col("doc_id") < 6)
    val inc = docs.filter(col("doc_id") === 6)
    val idx = java.nio.file.Files
      .createTempDirectory("lsh_idx_spec").toString
    Dedup.writeBandIndex(hist, "text", "doc_id", idx,
      n = 2, numPerms = 16, bands = 8)
    val got = Dedup.minhashLshPairsIncremental(s, inc, hist, idx,
      "text", "doc_id", n = 2, minJaccard = 0.6, numPerms = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashLshPairs(docs, "text", "doc_id",
      n = 2, minJaccard = 0.6, numPerms = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 == 6L || p._2 == 6L)
    assert(got == full)
    assert(got.contains((1L, 6L))) // the exact copy is found via the index
  }

  test("incremental LSH with a dup-heavy increment: collapse expansion " +
    "equals the full join restricted to increment-touching pairs") {
    val s = spark
    import s.implicits._
    // history: one hot page (2 copies) + an unrelated doc; increment:
    // 3 more copies of the hot page (same-set group within the
    // increment AND vs history), a near-dup, and a replayed history doc
    // (id 2 appears in the index and the increment — the replay corner)
    val page = "the quick brown fox jumps over the lazy dog tonight"
    val hist = Seq(
      (1L, page), (2L, page),
      (3L, "completely unrelated words about spark query engines"))
      .toDF("doc_id", "text")
    val inc = Seq(
      (10L, page), (11L, page), (12L, page),
      (13L, "the quick brown fox jumps over the lazy cat tonight"),
      (2L, page)) // replay
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("lsh_idx_dup_spec").toString
    Dedup.writeBandIndex(hist, "text", "doc_id", idx,
      n = 3, numPerms = 64, bands = 32)
    val gotRows = Dedup.minhashLshPairsIncremental(s, inc, hist, idx,
      "text", "doc_id", n = 3, minJaccard = 0.5, numPerms = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = gotRows.toSet
    // the no-final-distinct contract: the three pair sources must be
    // duplicate-free even under replay overlap
    assert(gotRows.length == got.size)
    val incIds = Set(10L, 11L, 12L, 13L, 2L)
    val full = Dedup.minhashLshPairs(
      hist.unionByName(inc.filter(col("doc_id") =!= 2L)), "text", "doc_id",
      n = 3, minJaccard = 0.5, numPerms = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => incIds(p._1) || incIds(p._2))
    assert(got == full)
    // every pair touches the increment; no self-pairs
    assert(got.forall(p => (incIds(p._1) || incIds(p._2)) && p._1 != p._2))
    assert(Seq((1L, 10L), (2L, 10L), (10L, 11L), (10L, 13L))
      .forall(got.contains))
  }

  test("incremental LSH doomed: rep-level set equals the pair-derived " +
    "policy under both historyWins settings") {
    val s = spark
    import s.implicits._
    // history ids deliberately NOT all smaller than increment ids (7 >
    // 4/5/6) so the two policies genuinely differ: under larger-id the
    // increment docs 4/5/6 survive a match with history doc 7; under
    // history-wins they drop
    val page = "the quick brown fox jumps over the lazy dog tonight"
    val hist = Seq(
      (1L, "completely unrelated words about spark query engines"),
      (7L, page))
      .toDF("doc_id", "text")
    val inc = Seq(
      (4L, page), (5L, page), (6L, page),
      (13L, "the quick brown fox jumps over the lazy cat tonight"),
      (20L, "another separate island of text with no neighbors"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("lsh_idx_doomed_spec").toString
    Dedup.writeBandIndex(hist, "text", "doc_id", idx,
      n = 3, numPerms = 64, bands = 32)
    val pairs = Dedup.minhashLshPairsIncremental(s, inc, hist, idx,
      "text", "doc_id", n = 3, minJaccard = 0.5, numPerms = 64, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incIds = Set(4L, 5L, 6L, 13L, 20L)
    def doomedOf(historyWins: Boolean): Set[Long] =
      Dedup.minhashLshDoomedIncremental(s, inc, hist, idx,
        "text", "doc_id", n = 3, minJaccard = 0.5, numPerms = 64,
        bands = 32, historyWins = historyWins)
        .collect().map(_.getLong(0)).toSet
    // pair-derived references, restricted to increment ids
    val largerId = pairs.map(_._2).filter(incIds)
    val historyWins = pairs.flatMap { case (a, b) =>
      (incIds(a), incIds(b)) match {
        case (true, true)   => Seq(b)        // in-batch: larger drops
        case (true, false)  => Seq(a)        // vs history: batch drops
        case (false, true)  => Seq(b)
        case _              => Nil
      }
    }
    assert(doomedOf(historyWins = false) == largerId)
    assert(doomedOf(historyWins = true) == historyWins)
    // the policies disagree on this input (4 survives larger-id as the
    // smallest id of its component, drops under history-wins)
    assert(!largerId.contains(4L) && historyWins.contains(4L))
  }

  test("leakage-safe split: cluster members share one split, the guard " +
    "actually moves a doc off its naive bucket, singletons match naive") {
    val s = spark
    import s.implicits._
    def naiveBucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 100).toInt
    }
    // a near-dup pair whose ids land in DIFFERENT naive buckets (found
    // by probing the same portable hash the operator uses), plus
    // distinct singleton docs
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val pairA = 1L
    val pairB = (2L to 500L)
      .find(b => naiveBucket(b) != naiveBucket(pairA)).get
    val docs = (Seq(
      (pairA, base),
      (pairB, base + " extra")) ++
      (1000L to 1019L).map(i =>
        (i, s"completely unrelated singleton document number $i " +
          s"carrying unique words w${i}a w${i}b w${i}c w${i}d w${i}e")))
      .toDF("doc_id", "text")
    val split = graft.ext.Pipeline
      .leakageSafeSplit(docs, "text", "doc_id", n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    // the pair clusters (canonical = min id) and shares ONE split
    assert(split(pairB)._1 == pairA, "pair did not cluster")
    assert(split(pairB)._3 == split(pairA)._3,
      "cluster members landed in different splits — leakage")
    // the guard is load-bearing: pairB's assigned bucket is its
    // CANONICAL's, not its own naive bucket
    assert(split(pairB)._2 == naiveBucket(pairA))
    assert(split(pairB)._2 != naiveBucket(pairB),
      "construction failed: pair ids hash to the same naive bucket")
    // singletons are their own canonical and match the naive split
    (1000L to 1019L).foreach { i =>
      assert(split(i)._1 == i && split(i)._2 == naiveBucket(i))
    }
    // buckets stay in range and splits partition them correctly
    split.values.foreach { case (_, b, sp) =>
      assert(b >= 0 && b < 100)
      assert(sp == (if (b < 80) "train"
        else if (b < 90) "validation" else "test"))
    }
  }
}
