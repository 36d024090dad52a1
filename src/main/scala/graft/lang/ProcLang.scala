package graft.lang

/** Control flow for stored-procedure bodies — the statement subset the
  * reference parses inside procs (`WSqlParser.cs:233-362`: WHILE with a
  * predicate + statement, IF with then/else, DECLARE, SET) interpreted
  * over the dialect:
  *
  * {{{
  *   DECLARE @x INT = 0;
  *   WHILE @x < 3
  *   BEGIN
  *     SET @x = @x + 1;
  *     INSERT NODE INTO People VALUES (...);
  *   END
  *   IF @x >= 3 BEGIN SELECT ... END ELSE BEGIN SELECT ... END
  * }}}
  *
  * IF/WHILE bodies must be `BEGIN ... END` blocks (`ELSE IF` chains
  * allowed); everything else is a dialect statement executed through
  * the normal pipeline. Parsing is [[SqlLex]]-mask-aware, so keywords
  * inside string literals or comments never terminate a statement.
  */
object ProcLang {

  sealed trait Stmt
  final case class Declare(name: String, init: Option[String]) extends Stmt
  final case class Assign(name: String, expr: String) extends Stmt
  final case class Branch(cond: String, thenB: Seq[Stmt],
      elseB: Seq[Stmt]) extends Stmt
  final case class Loop(cond: String, body: Seq[Stmt]) extends Stmt
  final case class Run(sql: String) extends Stmt

  def parse(body: String): Seq[Stmt] = new Parser(body).parseAll()

  private final class Parser(s: String) {
    private val m = SqlLex.mask(s)
    private var i = 0

    private def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'

    private def skipSeparators(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (i < s.length && (s(i).isWhitespace || s(i) == ';')) {
          i += 1; moved = true
        }
        // whole-comment tokens between statements
        if (i < s.length && m(i)) {
          val seg = SqlLex.segments(s.substring(i)).head
          if (seg.kind == SqlLex.Comment) { i += seg.text.length; moved = true }
        }
      }
    }

    /** the unmasked word starting at `i`, uppercased ("" when none) */
    private def peekWord(): String = {
      if (i >= s.length || m(i) || !Character.isLetter(s(i))) return ""
      var j = i
      while (j < s.length && isWordChar(s(j))) j += 1
      s.substring(i, j).toUpperCase
    }

    private def consumeWord(w: String): Unit = {
      require(peekWord() == w, s"expected $w at ...${s.substring(i).take(40)}")
      i += w.length
    }

    /** text from `i` until the first top-level occurrence of a stop
      * keyword or `;` or EOF; cursor lands ON the stop. `END` as a stop
      * word respects CASE ... END pairing inside the statement text.
      */
    private def readUntil(stopWords: Set[String],
        stopSemi: Boolean): String = {
      val start = i
      var depth = 0
      var caseDepth = 0
      while (i < s.length) {
        if (!m(i)) {
          val c = s(i)
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          else if (depth == 0) {
            if (stopSemi && c == ';') return s.substring(start, i)
            if (Character.isLetter(c) &&
              (i == 0 || !isWordChar(s(i - 1)))) {
              val w = peekWord()
              if (w == "CASE") caseDepth += 1
              else if (w == "END" && caseDepth > 0) caseDepth -= 1
              else if (stopWords(w)) return s.substring(start, i)
            }
          }
        }
        i += 1
      }
      s.substring(start)
    }

    def parseAll(): Seq[Stmt] = {
      val out = Seq.newBuilder[Stmt]
      skipSeparators()
      while (i < s.length) {
        out += statement(inBlock = false)
        skipSeparators()
      }
      out.result()
    }

    private def statement(inBlock: Boolean): Stmt = peekWord() match {
      case "DECLARE" =>
        consumeWord("DECLARE")
        val (name, tail) = varAndTail(inBlock)
        val eq = topLevelIndexOf(tail, '=')
        if (eq < 0) Declare(name, None)
        else Declare(name, Some(tail.substring(eq + 1).trim))
      case "SET" if varFollows("SET") =>
        consumeWord("SET")
        val (name, tail) = varAndTail(inBlock)
        val eq = topLevelIndexOf(tail, '=')
        require(eq >= 0, s"SET $name needs '= expr'")
        Assign(name, tail.substring(eq + 1).trim)
      case "IF" =>
        consumeWord("IF")
        val cond = readUntil(Set("BEGIN"), stopSemi = false).trim
        val thenB = block()
        skipSeparators()
        val elseB =
          if (peekWord() != "ELSE") Nil
          else {
            consumeWord("ELSE")
            skipSeparators()
            if (peekWord() == "IF") Seq(statement(inBlock)) // ELSE IF chain
            else block()
          }
        Branch(cond, thenB, elseB)
      case "WHILE" =>
        consumeWord("WHILE")
        val cond = readUntil(Set("BEGIN"), stopSemi = false).trim
        Loop(cond, block())
      case _ =>
        // inside BEGIN...END the block's END also terminates an
        // unsemicoloned final statement (CASE...END pairs are skipped)
        Run(readUntil(if (inBlock) Set("END") else Set.empty,
          stopSemi = true).trim)
    }

    /** `@name` plus the raw text until `;` (type decl and/or `= expr`) */
    private def varAndTail(inBlock: Boolean): (String, String) = {
      skipSeparators()
      require(i < s.length && s(i) == '@',
        s"expected @variable at ...${s.substring(i).take(40)}")
      var j = i + 1
      while (j < s.length && isWordChar(s(j))) j += 1
      val name = s.substring(i, j)
      i = j
      (name, readUntil(if (inBlock) Set("END") else Set.empty,
        stopSemi = true))
    }

    /** distinguish `SET @x = ...` from a dialect SET statement */
    private def varFollows(kw: String): Boolean = {
      var j = i + kw.length
      while (j < s.length && s(j).isWhitespace) j += 1
      j < s.length && s(j) == '@'
    }

    private def topLevelIndexOf(t: String, c: Char): Int = {
      val tm = SqlLex.mask(t)
      var depth = 0
      var j = 0
      while (j < t.length) {
        if (!tm(j)) {
          if (t(j) == '(') depth += 1
          else if (t(j) == ')') depth -= 1
          else if (t(j) == c && depth == 0) return j
        }
        j += 1
      }
      -1
    }

    private def block(): Seq[Stmt] = {
      skipSeparators()
      consumeWord("BEGIN")
      val out = Seq.newBuilder[Stmt]
      skipSeparators()
      while (peekWord() != "END") {
        require(i < s.length, "unterminated BEGIN block")
        out += statement(inBlock = true)
        skipSeparators()
      }
      consumeWord("END")
      out.result()
    }
  }
}
