package graft.lang

/** One quote/comment-aware scanner for the dialect's text-level passes —
  * retires the per-call-site quote trackers (`mapOutsideQuotes`, the
  * splitters, EXISTS paren matching) that each re-implemented string
  * handling and none of which knew about escapes or comments.
  *
  * Lexical rules (Spark SQL's):
  *   - `'...'` and `"..."` literals; a backslash escapes the next char
  *     (`'it\'s'`), a doubled quote escapes itself (`'don''t'`);
  *   - `` `...` `` backquoted identifiers (`` `weird name` ``);
  *   - `-- line` comments to end of line;
  *   - `/* block */` comments, nested (Spark supports nesting).
  */
object SqlLex {

  sealed trait Kind
  /** plain SQL text — the only kind rewrites may touch */
  case object Code extends Kind
  /** a string literal or backquoted identifier, quotes included */
  case object Lit extends Kind
  case object Comment extends Kind

  final case class Seg(kind: Kind, text: String)

  /** split `sql` into Code / Lit / Comment segments; concatenating the
    * texts reproduces the input byte-for-byte
    */
  def segments(sql: String): Vector[Seg] = {
    val out = Vector.newBuilder[Seg]
    val n = sql.length
    var i = 0
    var codeStart = 0
    def flushCode(until: Int): Unit =
      if (until > codeStart) out += Seg(Code, sql.substring(codeStart, until))
    while (i < n) {
      val c = sql(i)
      if (c == '\'' || c == '"' || c == '`') {
        flushCode(i)
        val q = c
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val d = sql(j)
          if (d == '\\' && q != '`' && j + 1 < n) j += 2 // backslash escape
          else if (d == q && j + 1 < n && sql(j + 1) == q) j += 2 // doubled
          else if (d == q) { j += 1; closed = true }
          else j += 1
        }
        out += Seg(Lit, sql.substring(i, j))
        i = j; codeStart = j
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        flushCode(i)
        var j = i + 2
        while (j < n && sql(j) != '\n') j += 1
        out += Seg(Comment, sql.substring(i, j))
        i = j; codeStart = j
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        flushCode(i)
        var depth = 1
        var j = i + 2
        while (j < n && depth > 0) {
          if (sql(j) == '/' && j + 1 < n && sql(j + 1) == '*') { depth += 1; j += 2 }
          else if (sql(j) == '*' && j + 1 < n && sql(j + 1) == '/') { depth -= 1; j += 2 }
          else j += 1
        }
        out += Seg(Comment, sql.substring(i, j))
        i = j; codeStart = j
      } else i += 1
    }
    flushCode(n)
    out.result()
  }

  /** apply `f` to the Code segments only; literals and comments pass
    * through byte-identical
    */
  def mapCode(sql: String)(f: String => String): String =
    segments(sql).map(s => if (s.kind == Code) f(s.text) else s.text)
      .mkString

  /** `masked(i)` = position i lies inside a literal or comment */
  def mask(sql: String): Array[Boolean] = {
    val m = new Array[Boolean](sql.length)
    var pos = 0
    segments(sql).foreach { s =>
      if (s.kind != Code)
        java.util.Arrays.fill(m, pos, pos + s.text.length, true)
      pos += s.text.length
    }
    m
  }

  /** split on a 1-char separator at paren depth 0, outside literals and
    * comments; empty/blank pieces are dropped after trimming
    */
  def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val m = mask(s)
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      if (!m(i)) s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == sep && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** split a boolean expression on top-level `AND` (word-bounded,
    * case-insensitive), outside parens/literals/comments
    */
  def splitTopLevelAnd(s: String): Seq[String] = {
    val m = mask(s)
    val upper = s.toUpperCase
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    def wordAt(j: Int, w: String): Boolean =
      upper.regionMatches(j, w, 0, w.length) &&
        (j == 0 || !Character.isLetterOrDigit(upper(j - 1)) && upper(j - 1) != '_') &&
        (j + w.length >= s.length ||
          !Character.isLetterOrDigit(upper(j + w.length)) && upper(j + w.length) != '_')
    while (i < s.length) {
      if (!m(i)) s(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && wordAt(i, "AND")) {
            out += s.substring(start, i)
            i += 3; start = i
          } else i += 1
      } else i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** index of the `)` matching the `(` at `open`, or -1 — literal- and
    * comment-aware
    */
  def matchingParen(s: String, open: Int): Int = {
    val m = mask(s)
    var depth = 0
    var i = open
    while (i < s.length) {
      if (!m(i)) {
        if (s(i) == '(') depth += 1
        else if (s(i) == ')') { depth -= 1; if (depth == 0) return i }
      }
      i += 1
    }
    -1
  }
}
