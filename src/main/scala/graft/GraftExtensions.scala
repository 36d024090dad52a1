package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for the native expressions: every codegen Expression in
  * `graft.functions` becomes a plain SQL function, so `spark.sql(
  * "SELECT html_to_text(body) FROM raw")` works exactly like the
  * Scala column API — the idiomatic `SparkSessionExtensions` hookup
  * (`spark.sql.extensions=graft.GraftExtensions`), plus a runtime
  * [[GraftExtensions.register]] for sessions already running.
  *
  * Integer parameters (shingle width, permutation count, …) arrive as
  * SQL literal arguments and are bound at resolution time — they
  * parameterize codegen, so they must be foldable, and a non-literal
  * fails with a readable message instead of a ClassCastException.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}

object GraftExtensions {

  private def intLit(name: String, e: Expression, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name: argument ${pos + 1} must be an INTEGER literal, got $other")
  }

  private def longLit(name: String, e: Expression, pos: Int): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name: argument ${pos + 1} must be a BIGINT literal, got $other")
  }

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): (String, Seq[Expression] => Expression) =
    name -> { args: Seq[Expression] =>
      require(args.length == n,
        s"$name expects $n argument(s), got ${args.length}")
      f(args)
    }

  /** (name, builder) for every exposed function */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    arity("nfc_normalize", 1)(a => NfcNormalize(a.head)),
    arity("strip_accents", 1)(a => StripAccents(a.head)),
    arity("html_to_text", 1)(a => HtmlToText(a.head)),
    arity("url_host", 1)(a => UrlHost(a.head)),
    arity("url_canonicalize", 1)(a => UrlCanonicalize(a.head)),
    // NOTE: no luhn_check here — Spark 4 ships a builtin of that name
    // (any-length digit validation); ours is the 13-19-digit card form
    // and shadowing a builtin with different length semantics would be
    // a trap. SQL users compose card_redact/card_count instead.
    arity("card_redact", 1)(a => CardRedact(a.head)),
    arity("card_count", 1)(a => CardCount(a.head)),
    arity("iban_redact", 1)(a => IbanRedact(a.head)),
    arity("iban_count", 1)(a => IbanCount(a.head)),
    arity("dominant_script", 1)(a => DominantScript(a.head)),
    arity("dominant_script_frac", 1)(a => DominantScriptFrac(a.head)),
    arity("char_entropy", 1)(a => CharEntropy(a.head)),
    arity("simhash64", 1)(a => SimHash64(a.head)),
    arity("minhash_sig", 2)(a =>
      MinHashSig(a.head, intLit("minhash_sig", a(1), 1))),
    arity("shingle_hashes", 2)(a =>
      ShingleHashes(a.head, intLit("shingle_hashes", a(1), 1))),
    arity("word_ngrams", 2)(a =>
      WordNgrams(a.head, intLit("word_ngrams", a(1), 1))),
    arity("cosine_sim", 2)(a => CosineSim(a.head, a(1))),
    arity("srp_bands", 4)(a => SrpBands(a.head,
      intLit("srp_bands", a(1), 1), intLit("srp_bands", a(2), 2),
      longLit("srp_bands", a(3), 3))),
    arity("misra_gries", 2)(a =>
      MisraGriesAgg(a.head, intLit("misra_gries", a(1), 1))
        .toAggregateExpression()),
    // Column-composition operators ride the same registry through the
    // ColumnBridge round-trip — a builder only needs Expression in,
    // Expression out, and a composed Column IS an expression tree
    col1("token_count", graft.ext.TextFunctions.tokenCount),
    col1("stopword_ratio", graft.ext.TextFunctions.stopwordRatio),
    col1("mean_token_len", graft.ext.TextFunctions.meanTokenLen),
    col1("quality_score", graft.ext.TextFunctions.qualityScore),
    col1("lang_id", graft.ext.TextFunctions.langId),
    col1("gopher_keep", t => graft.ext.TextFunctions.gopherKeep(t)),
    col1("c4_doc_keep", t => graft.ext.TextFunctions.c4DocKeep(t)))

  private def col1(name: String,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (String, Seq[Expression] => Expression) =
    arity(name, 1)(a =>
      org.apache.spark.sql.graftbridge.ColumnBridge.convertedExpression(
        f(org.apache.spark.sql.graftbridge.ColumnBridge.column(a.head))))

  /** register into a LIVE session (tests, notebooks) — same builders
    * as the extensions path. Idempotent: a name already present (via
    * `spark.sql.extensions` injection or an earlier call — every
    * GraphSession construction lands here) is left alone, so repeated
    * registration neither replaces functions nor spams the
    * SimpleFunctionRegistry "function replaced" WARN into stderr.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
