package graft

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("native expressions callable from plain SQL after registration; " +
    "results equal the column API; literal-parameter misuse reports " +
    "readably") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq((1L, "<p>pay 4111 1111 1111 1111 &amp; DE89370400440532013000</p>"),
      (2L, "Привет <b>мир</b>"))
      .toDF("id", "t").createOrReplaceTempView("raw")

    val r = spark.sql(
      """SELECT id, html_to_text(t) AS txt,
        |  card_count(html_to_text(t)) AS cards,
        |  iban_count(html_to_text(t)) AS ibans,
        |  dominant_script(html_to_text(t)) AS script,
        |  simhash64(shingle_hashes(split(t, ' '), 2)) AS sh,
        |  size(word_ngrams(split(t, ' '), 2)) AS bigrams
        |FROM raw ORDER BY id""".stripMargin).collect()
    assert(r(0).getString(1) == "pay 4111 1111 1111 1111 & " +
      "DE89370400440532013000")
    assert(r(0).getInt(2) == 1 && r(0).getInt(3) == 1)
    assert(r(1).getString(4) == "cyrillic")

    // SQL route == column API route
    val viaSql = spark.sql(
      "SELECT simhash64(shingle_hashes(split(t, ' '), 2)) " +
        "FROM raw WHERE id = 2")
      .head().getLong(0)
    val viaApi = spark.table("raw").filter($"id" === 2)
      .select(graft.functions.SimHash64(graft.functions.ShingleHashes(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("t"), " "), 2)))
      .head().getLong(0)
    assert(viaSql == viaApi)

    // aggregate: misra_gries usable in GROUP BY-less aggregation
    val cand = spark.sql(
      """SELECT misra_gries(w, 4) AS c FROM (
        |  SELECT explode(split('a a a b c a b', ' ')) AS w)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0)).toSet
    assert(cand.contains("a"), cand.toString)

    // Column-composition operators ride the same registry
    val gates = spark.sql(
      """SELECT token_count(t) AS tc, lang_id(t) AS lid,
        |  gopher_keep(t) AS gk, c4_doc_keep(t) AS ck
        |FROM raw WHERE id = 1""".stripMargin).head()
    assert(gates.getInt(0) > 0)
    assert(!gates.isNullAt(1))
    assert(!gates.getBoolean(2)) // too short for the Gopher word gate

    // the spark.sql.extensions injection path: every injected entry
    // must register cleanly through the extension hook's own
    // registerFunctions (what session construction calls) — a fresh
    // in-JVM session can't re-read static confs, so the hook is
    // exercised directly against the live registry
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.ColumnBridge.registerInjectedFunctions(
      ext, spark.sessionState.functionRegistry)
    val v = spark.sql(
      "SELECT url_host('https://A.B.c/x'), token_count('a b c')").head()
    assert(v.getString(0) == "a.b.c" && v.getInt(1) == 3)

    // non-literal parameter → readable refusal
    val err = intercept[Exception] {
      spark.sql("SELECT word_ngrams(split(t, ' '), id) FROM raw").collect()
    }
    assert(err.getMessage.contains("INTEGER literal") ||
      err.getCause != null &&
        err.getCause.getMessage.contains("INTEGER literal"),
      err.getMessage)
  }
}
