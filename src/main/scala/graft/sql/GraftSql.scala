package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Trino-dialect SQL entry point — the role trino-cli / the Python
  * `trino` DBAPI client play in walden (`docker/devserver/Dockerfile:24-29`,
  * SURVEY.md §3.1/§3.3): accept Trino-flavored SQL text (scripted,
  * multi-statement) and run it on Spark.
  *
  * Most Trino functions are covered by name-level registrations
  * (graft.functions.GraftFunctions). The rewrites here handle the few
  * spots where Spark's PARSER owns the name with different grammar
  * (`date_diff(unit, ...)` demands an unquoted unit keyword, Trino
  * quotes it), so a registry entry can never see the call.
  */
object TrinoDialect {

  private val dateDiff = """(?i)\bdate_diff\(\s*'(\w+)'\s*,""".r
  private val dateAddU = """(?i)\bdate_add\(\s*'(\w+)'\s*,""".r
  private val approxPct = """(?i)\bapprox_percentile\(""".r
  // Trino type/relation spellings Spark's parser rejects (probed r12):
  // bare VARCHAR needs a length in Spark (parameterized VARCHAR(n)
  // passes through untouched), VARBINARY/DOUBLE PRECISION don't exist,
  // TABLESAMPLE takes (n PERCENT) not BERNOULLI/SYSTEM(n) — SYSTEM
  // (block sampling) downgrades to row sampling, which is the
  // approximation a sample already is — and the ROW constructor is
  // Spark's struct (field names col1.. instead of anonymous).
  private val bareVarchar = """(?i)\bVARCHAR\b(?!\s*\()""".r
  private val varbinary = """(?i)\bVARBINARY\b""".r
  private val doublePrec = """(?i)\bDOUBLE\s+PRECISION\b""".r
  private val sampleRx =
    """(?i)\bTABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(\s*([0-9]+(?:\.[0-9]+)?)\s*\)""".r
  private val rowCtor = """(?i)\bROW\s*\(""".r
  // Trino SQL routines (round 14): `CREATE [OR REPLACE] FUNCTION
  // f(x T) RETURNS T [LANGUAGE SQL] [DETERMINISTIC] RETURN expr` is
  // Spark 4's native SQL-UDF grammar — but Trino routines live in a
  // catalog while the session-scoped parity here is a TEMPORARY
  // function, so an UNQUALIFIED name gains TEMPORARY (a qualified
  // name passes through to the named catalog untouched). Compound
  // BEGIN...END bodies stay loud parser rejections (Spark supports
  // single-expression RETURN only).
  private val createFn =
    """(?i)\bCREATE\s+(OR\s+REPLACE\s+)?FUNCTION\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r

  /** Rewrite Trino spellings Spark's parser reserves. Conservative,
    * token-local rewrites only — anything else goes through untouched.
    * Rewrites apply ONLY outside string literals: a literal containing
    * "approx_percentile(" is user DATA and must survive verbatim.
    */
  def rewrite(sql: String): String = {
    val named = mapOutsideLiterals(sql) { code =>
      // Trino date_diff('day', a, b) -> Spark date_diff(DAY, a, b)
      val s1 = dateDiff.replaceAllIn(code, m => s"date_diff(${m.group(1).toUpperCase},")
      // Trino date_add('day', n, ts) -> Spark timestampadd(DAY, n, ts)
      val s2 = dateAddU.replaceAllIn(s1, m => s"timestampadd(${m.group(1).toUpperCase},")
      // Trino approx_percentile(x, p) == Spark percentile_approx(x, p)
      val s3 = approxPct.replaceAllIn(s2, _ => "percentile_approx(")
      val s4 = bareVarchar.replaceAllIn(s3, _ => "STRING")
      val s5 = varbinary.replaceAllIn(s4, _ => "BINARY")
      val s6 = doublePrec.replaceAllIn(s5, _ => "DOUBLE")
      val s7a = sampleRx.replaceAllIn(s6, m => s"TABLESAMPLE (${m.group(1)} PERCENT)")
      val s7 = createFn.replaceAllIn(s7a, m =>
        s"CREATE ${Option(m.group(1)).getOrElse("")}TEMPORARY FUNCTION ${m.group(2)}(")
      // ROW in a TYPE position first (CAST(x AS ROW(a INT))): Spark
      // spells struct TYPES as STRUCT<...>, so the constructor rewrite
      // below must not fire there (r12 advice — struct(a INT) is
      // unparseable). Then every remaining ROW( is a constructor.
      rowCtor.replaceAllIn(rewriteRowTypes(s7), _ => "struct(")
    }
    // Trino MATCH_RECOGNIZE clause -> graft_match_recognize TVF (its
    // own literal-aware scanner; no-op without the keyword). LAST: the
    // rewrite quotes DEFINE/MEASURES into TVF string literals, where
    // the function-name rewrites above could no longer reach them.
    // JSON_TABLE and UNNEST (round 12) lower after it for the same
    // reason — their own scanners are literal-aware.
    UnnestSql.rewrite(JsonTableSql.rewrite(MatchRecognizeSql.rewrite(named)))
  }

  /** Trino's ROW TYPE spelling -> Spark's STRUCT<...> (r12 advice).
    * The one type position token-local context can prove is `AS ROW(`
    * — CAST/TRY_CAST type arguments (an alias named ROW followed by a
    * paren is not valid SQL, so the pattern cannot misfire on
    * aliases). Inside the converted span every nested ROW( is also a
    * type and converts recursively; field-name/type pairs pass through
    * unchanged (Spark's STRUCT<a INT> colon is optional, and VARCHAR
    * etc. were already rewritten upstream). Unbalanced parens are left
    * for the parser to reject. */
  private val asRowType = """(?i)\bAS\s+ROW\s*\(""".r
  private val rowTypeInner = """(?i)\bROW\s*\(""".r

  private def matchingParen(s: String, open: Int): Int = {
    var d = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') d += 1
      else if (c == ')') { d -= 1; if (d == 0) return i }
      i += 1
    }
    -1
  }

  private def convertRowTypeBody(s: String): String =
    rowTypeInner.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        val open = m.end - 1
        val close = matchingParen(s, open)
        if (close < 0) s
        else s.substring(0, m.start) + "STRUCT<" +
          convertRowTypeBody(s.substring(open + 1, close)) + ">" +
          convertRowTypeBody(s.substring(close + 1))
    }

  private def rewriteRowTypes(code: String): String =
    asRowType.findFirstMatchIn(code) match {
      case None => code
      case Some(m) =>
        val open = m.end - 1
        val close = matchingParen(code, open)
        if (close < 0) code
        else code.substring(0, m.start) + "AS STRUCT<" +
          convertRowTypeBody(code.substring(open + 1, close)) + ">" +
          rewriteRowTypes(code.substring(close + 1))
    }

  /** Apply `f` to the non-literal segments of `sql`, passing
    * single-quoted literals (with '' escapes) through untouched.
    *
    * Caveat: the date_diff/date_add unit rewrites intentionally consume
    * a leading `'unit',` — those regexes carry enough left context
    * (`date_diff(`) that they can only fire where the quoted token IS
    * the unit argument, so the unit quote is included in the code
    * segment by splitting literals lazily: a literal immediately
    * preceded by `date_diff(`/`date_add(` stays in the code segment.
    */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val code = new StringBuilder
    var i = 0
    val unitCallTail = """(?is).*\b(date_diff|date_add)\(\s*$""".r
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        // find literal end (handling '' escape)
        var j = i + 1
        var done = false
        while (j < sql.length && !done) {
          if (sql.charAt(j) == '\'') {
            if (j + 1 < sql.length && sql.charAt(j + 1) == '\'') j += 2
            else done = true
          } else j += 1
        }
        val end = math.min(j + 1, sql.length)
        val lit = sql.substring(i, end)
        if (unitCallTail.findFirstIn(code).isDefined) {
          // unit argument of date_diff/date_add: part of the rewrite site
          code.append(lit)
        } else {
          out.append(f(code.toString)); code.clear()
          out.append(lit)
        }
        i = end
      } else { code.append(c); i += 1 }
    }
    out.append(f(code.toString))
    out.toString
  }

  /** Split a multi-statement script on ';' outside quotes/comments —
    * trino-cli `--execute` scripted mode (`tf/test-hive.sh:14-24`).
    * Twin scanner: `QueryService.stripComments` lexes the same comment
    * grammar but REMOVES comments — a comment-lexing fix here usually
    * applies there too. */
  def splitStatements(script: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    var inS = false // 'string'
    var inD = false // "ident"
    var inLineComment = false
    var blockDepth = 0 // /* ... */ nests in Spark's lexer (SQL standard)
    while (i < script.length) {
      val c = script.charAt(i)
      val next = if (i + 1 < script.length) script.charAt(i + 1) else '\u0000'
      if (inLineComment) {
        if (c == '\n') inLineComment = false
        cur.append(c)
      } else if (blockDepth > 0) {
        cur.append(c)
        if (c == '/' && next == '*') { blockDepth += 1; cur.append(next); i += 1 }
        else if (c == '*' && next == '/') { blockDepth -= 1; cur.append(next); i += 1 }
      } else if (inS) {
        cur.append(c)
        if (c == '\'' && next == '\'') { cur.append(next); i += 1 } // escaped ''
        else if (c == '\'') inS = false
      } else if (inD) {
        cur.append(c); if (c == '"') inD = false
      } else c match {
        case '\'' => inS = true; cur.append(c)
        case '"' => inD = true; cur.append(c)
        case '-' if next == '-' => inLineComment = true; cur.append(c)
        case '/' if next == '*' => blockDepth = 1; cur.append(c); cur.append(next); i += 1
        case ';' => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }
}

object GraftSql {

  private val explainAnalyze = """(?is)^\s*EXPLAIN\s+ANALYZE\s+(.*)$""".r

  /** Run one Trino-dialect statement.
    *
    * `EXPLAIN ANALYZE <query>` (Trino's executed-plan-with-metrics
    * statement, which Spark SQL lacks) executes the query and returns
    * the FINAL adaptive physical plan plus per-operator runtime
    * metrics as a single `plan` column. The query must run through its
    * OWN QueryExecution (toRdd-based, below) — a derived action like
    * `count()` finalizes a different plan and leaves this one's
    * metrics empty — and must NOT `collect()`: profiling a large query
    * may never materialize its result set on the driver.
    */
  def sql(spark: SparkSession, text: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    text match {
      case explainAnalyze(body) =>
        import spark.implicits._
        val df = spark.sql(TrinoDialect.rewrite(body))
        // Execute THIS QueryExecution without collecting: profiling a
        // large query must not pull its result set onto the driver.
        // toRdd runs the (adaptive) executed plan and populates the
        // same SQLMetrics a collect would.
        df.queryExecution.toRdd.foreach(_ => ())
        val exec = df.queryExecution.executedPlan
        val root = exec match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case other => other
        }
        val metricLines = Seq.newBuilder[String]
        def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
          val ms = p.metrics.toSeq
            .filter { case (_, m) => m.value > 0 }
            .sortBy(_._1)
            .map { case (k, m) => s"$k=${m.value}" }
          metricLines += ("  " * depth + p.nodeName +
            (if (ms.isEmpty) "" else ms.mkString(" [", ", ", "]")))
          // AQE stage wrappers are leaves whose real subtree hangs off
          // .plan; a ReusedExchange's subtree already printed once
          val kids = p match {
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
            case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Nil
            case other => other.children
          }
          kids.foreach(walk(_, depth + 1))
        }
        walk(root, 0)
        Seq(exec.toString + "\n== Runtime metrics ==\n" + metricLines.result().mkString("\n"))
          .toDF("plan")
      case _ => spark.sql(TrinoDialect.rewrite(text))
    }
  }

  /** Scripted mode: run every statement, return the results in order
    * (mirrors `trino-cli --execute` as used by walden's smoke test). */
  def execute(spark: SparkSession, script: String): Seq[DataFrame] =
    TrinoDialect.splitStatements(script).map(sql(spark, _))

  /** Parameterized statement — Trino's prepared-statement protocol
    * surface (walden's Python DBAPI client), on Spark's named-parameter
    * binding (no string splicing, injection-safe). */
  def sqlWith(spark: SparkSession, text: String, args: Map[String, Any]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(TrinoDialect.rewrite(text), args)
  }
}
