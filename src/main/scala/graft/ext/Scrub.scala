package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: regex redaction of emails,
  * IPv4 addresses, and phone-like digit runs, plus per-doc redaction
  * counts for corpus auditing (the C4/Dolma-style cleanup stage).
  *
  * Pure column expressions — `regexp_replace` chains stay inside
  * whole-stage codegen, so scrubbing is a map-only pass that fuses with
  * neighbouring stages (no shuffle, no UDF). Patterns deliberately use
  * the RE2-compatible subset of Java regex (character classes, bounded
  * repetition, `\b`; no lookaround, no backreferences) so an external
  * engine can replay them bit-for-bit for verification.
  */
object Scrub {

  /** (name, pattern, replacement) — order matters: emails first so their
    * digit runs can't be half-eaten by the phone pattern, SSNs before
    * phones so the dash-separated 3-2-4 shape keeps its own class.
    * The phone pattern requires the leading '+' (international form,
    * dashes allowed, 7-15 digits): unprefixed digit runs are far more
    * often ids/dates than phone numbers, so they pass through.
    */
  val DefaultPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9-]{6,14}[0-9]\\b", "<PHONE>"))

  /** Redacted text: each pattern replaced globally, in order. */
  def redact(text: Column,
      patterns: Seq[(String, String, String)] = DefaultPatterns): Column =
    patterns.foldLeft(text) { case (acc, (_, re, repl)) =>
      regexp_replace(acc, re, repl)
    }

  /** Total matches across patterns BEFORE redaction — the audit count.
    * Counted pattern-by-pattern on the progressively-redacted text (same
    * order as [[redact]]) so overlapping patterns aren't double-counted.
    */
  def redactionCount(text: Column,
      patterns: Seq[(String, String, String)] = DefaultPatterns): Column = {
    val (_, counts) = patterns.foldLeft((text, Seq.empty[Column])) {
      case ((acc, cs), (_, re, repl)) =>
        (regexp_replace(acc, re, repl),
          cs :+ size(regexp_extract_all(acc, lit(re), lit(0))))
    }
    counts.reduce(_ + _)
  }

  /** matches of ONE named pattern, on the raw text (per-class audit) */
  def matchCount(text: Column, name: String,
      patterns: Seq[(String, String, String)] = DefaultPatterns): Column = {
    val re = patterns.collectFirst { case (n, r, _) if n == name => r }
      .getOrElse(throw new IllegalArgumentException(s"unknown pattern $name"))
    size(regexp_extract_all(text, lit(re), lit(0)))
  }
}
