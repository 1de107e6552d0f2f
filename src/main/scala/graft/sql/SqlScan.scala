package graft.sql

/** Shared literal-aware SQL text scanning for the source-to-source
  * dialect rewrites ([[JsonTableSql]], [[UnnestSql]]; the
  * MATCH_RECOGNIZE rewriter predates this and keeps its own richer
  * scanner). Single-quoted literals with '' escapes only — the grammar
  * Spark's lexer and Trino's share for string literals. */
private[sql] object SqlScan {

  /** Replace literal CONTENTS with spaces (offsets stay stable, quotes
    * stay so masked text still lexes). */
  def maskLiterals(sql: String): String = {
    val b = new StringBuilder(sql)
    var i = 0
    while (i < b.length) {
      if (b.charAt(i) == '\'') {
        var j = i + 1
        var done = false
        while (j < b.length && !done) {
          if (b.charAt(j) == '\'') {
            if (j + 1 < b.length && b.charAt(j + 1) == '\'') j += 2 else done = true
          } else { b.setCharAt(j, ' '); j += 1 }
        }
        i = j + 1
      } else i += 1
    }
    b.toString
  }

  /** Index of the ')' closing the '(' at `open` (literal-aware). */
  def closeParen(sql: String, open: Int, what: String): Int = {
    val masked = maskLiterals(sql)
    var depth = 0
    var i = open
    while (i < masked.length) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"$what: unbalanced parentheses in '$sql'")
  }

  /** Split on top-level commas (paren- and literal-aware). */
  def splitTop(s: String): Seq[String] = {
    val masked = maskLiterals(s)
    val cuts = scala.collection.mutable.ArrayBuffer[Int](-1)
    var depth = 0
    var i = 0
    while (i < masked.length) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => cuts += i
        case _ => ()
      }
      i += 1
    }
    cuts += s.length
    cuts.sliding(2).map(w => s.substring(w(0) + 1, w(1))).toSeq
  }
}
