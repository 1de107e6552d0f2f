package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.MatchRecognizeSql.rewrite

/** String-level contract of the MATCH_RECOGNIZE source rewrite — the
  * pure-function half of the surface (SqlSpec runs the end-to-end SQL;
  * this pins the text transformations that never reach a session). */
class MatchRecognizeSqlSpec extends AnyFunSuite {

  private val basic = """SELECT * FROM t MATCH_RECOGNIZE (
      PARTITION BY k ORDER BY ts
      PATTERN (A+) DEFINE A AS A.v > 0)"""

  test("no keyword: text passes through byte-identical") {
    val sql = "SELECT match_recognizer, x FROM t -- not the clause"
    assert(rewrite(sql) eq sql)
  }

  test("basic clause lowers onto the TVF with symbol prefixes stripped") {
    val out = rewrite(basic)
    assert(out.contains("graft_match_recognize('t', 'k', 'ts', 'A:v > 0', 'A+', '', 'one', 'false')"), out)
  }

  test("keyword inside a string literal is untouched") {
    val sql = "SELECT 'use MATCH_RECOGNIZE (here)' AS doc FROM t"
    assert(rewrite(sql) == sql)
  }

  test("alias after the clause survives in place") {
    val out = rewrite(basic.dropRight(1) + ") AS m")
    assert(out.contains("'false') AS m"), out)
  }

  test("two clauses in one statement both rewrite") {
    val two = s"$basic UNION ALL ${basic.replace("FROM t ", "FROM u ")}"
    val out = rewrite(two)
    assert("graft_match_recognize".r.findAllIn(out).size == 2, out)
    assert(!out.toUpperCase.contains("MATCH_RECOGNIZE ("), out)
  }

  test("PREV/NEXT lower to a lag/lead window wrapper with prePartitioned") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (D+ U?) DEFINE D AS D.v < PREV(D.v), U AS U.v > NEXT(U.v, 2))""")
    assert(out.contains("lag(v, 1) OVER (PARTITION BY k ORDER BY ts) AS __mr_prev_v_1"), out)
    assert(out.contains("lead(v, 2) OVER (PARTITION BY k ORDER BY ts) AS __mr_next_v_2"), out)
    assert(out.contains("'D:v < __mr_prev_v_1;U:v > __mr_next_v_2'"), out)
    assert(out.contains("'true')"), out) // prePartitioned: wrapper window clusters+sorts
  }

  test("subquery source embeds as a query string (quotes doubled)") {
    val out = rewrite("""SELECT * FROM (SELECT * FROM t WHERE cat = 'a,b (c')
        MATCH_RECOGNIZE (PARTITION BY k ORDER BY ts
        PATTERN (A) DEFINE A AS A.v > 0)""")
    assert(out.contains("graft_match_recognize('SELECT * FROM t WHERE cat = ''a,b (c'''"), out)
  }

  test("defines with literals containing commas/parens do not missplit") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (A B) DEFINE A AS A.s = 'x,y)', B AS B.f IN (1, 2))""")
    assert(out.contains("'A:s = ''x,y)'';B:f IN (1, 2)'"), out)
  }

  test("undefined pattern symbols default to true") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts PATTERN (A G) DEFINE A AS A.v > 0)""")
    assert(out.contains("'A:v > 0;G:true'"), out)
  }

  test("MATCH_NUMBER() measures alias match_num in a post-select, order kept") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(A.v) AS fv, MATCH_NUMBER() AS mn, COUNT(*) AS n
        PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(out.contains("(SELECT k, match_num, fv, match_num AS mn, n FROM graft_match_recognize("), out)
    assert(out.contains("'fv:first:A:v,n:count:*'"), out)
  }

  test("ORDER BY DESC renders direction into order_cols and nav windows") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts DESC, seq ASC
        PATTERN (A+) DEFINE A AS A.v > PREV(A.v))""")
    assert(out.contains("'ts DESC,seq'"))
    assert(out.contains("ORDER BY ts DESC, seq"))    // the lag window
    assert(out.contains("'true'"))                   // prePartitioned rides
  }

  test("AFTER MATCH SKIP TO NEXT ROW selects the *_next TVF mode") {
    val one = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(one.contains("'one_next'"))
    val all = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        ALL ROWS PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(all.contains("'all_next'"))
    val past = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(past.contains("'one'") && !past.contains("_next"))
  }

  test("unsupported forms fail loudly with the feature named") {
    def err(body: String): String =
      intercept[Exception](rewrite(
        s"SELECT * FROM t MATCH_RECOGNIZE ($body)")).getMessage
    assert(err("PARTITION BY k ORDER BY ts DESC NULLS FIRST PATTERN (A) DEFINE A AS A.v > 0")
      .contains("NULLS"))
    assert(err("PARTITION BY k ORDER BY ts SUBSET U = (A, B) PATTERN (A) DEFINE A AS A.v > 0")
      .contains("SUBSET"))
    assert(err("PARTITION BY k ORDER BY ts AFTER MATCH SKIP TO FIRST A PATTERN (A) DEFINE A AS A.v > 0")
      .contains("SKIP TO NEXT ROW"))
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A) DEFINE A AS FIRST(A.v) > 0")
      .contains("navigation"))
    assert(err("PARTITION BY k ORDER BY ts ALL ROWS PER MATCH WITH UNMATCHED ROWS PATTERN (A) DEFINE A AS A.v > 0")
      .contains("UNMATCHED"))
    assert(err("PARTITION BY k ORDER BY ts MEASURES CLASSIFIER() AS c PATTERN (A) DEFINE A AS A.v > 0")
      .contains("MEASURES expression"))
    assert(err("ORDER BY ts PATTERN (A) DEFINE A AS A.v > 0")
      .contains("PARTITION BY"))
  }
}
