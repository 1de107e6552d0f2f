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
    assert(out.contains("graft_match_recognize('t', 'k', 'ts', 'A:v > 0', 'A+', '', 'one', 'false', 'past last row', '')"), out)
  }

  test("keyword inside a string literal is untouched") {
    val sql = "SELECT 'use MATCH_RECOGNIZE (here)' AS doc FROM t"
    assert(rewrite(sql) == sql)
  }

  test("alias after the clause survives in place") {
    val out = rewrite(basic.dropRight(1) + ") AS m")
    assert(out.contains("'past last row', '') AS m"), out)
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
    assert(out.contains("'true', 'past last row', '')"), out) // prePartitioned: wrapper window clusters+sorts
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

  test("AFTER MATCH forms lower to the TVF skip spec") {
    def mr(clauses: String): String = rewrite(
      s"""SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          $clauses
          PATTERN (A+ B) DEFINE A AS A.v > 0, B AS B.v < 0)""")
    assert(mr("AFTER MATCH SKIP TO NEXT ROW").contains("'to next row'"))
    assert(mr("ALL ROWS PER MATCH AFTER MATCH SKIP TO NEXT ROW")
      .contains("'all_show_empty', 'false', 'to next row'"))
    assert(mr("AFTER MATCH SKIP PAST LAST ROW").contains("'past last row'"))
    assert(mr("").contains("'past last row'"))
    assert(mr("AFTER MATCH SKIP TO LAST A").contains("'to last A'"))
    assert(mr("AFTER MATCH SKIP TO FIRST B").contains("'to first B'"))
    val e = intercept[Exception](mr("AFTER MATCH SKIP TO FIRST Z"))
    assert(e.getMessage.contains("unknown pattern symbol"), e.getMessage)
  }

  test("SUBSET variables expand to symbol unions in MEASURES only") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES COUNT(U.*) AS n_u, MAX(U.v) AS top, CLASSIFIER() AS c
        ONE ROW PER MATCH
        PATTERN (A+ B+)
        SUBSET U = (A, B)
        DEFINE A AS A.v > 0, B AS B.v < 0)""")
    assert(out.contains("n_u:count:A|B"), out)
    assert(out.contains("top:max:A|B:v"), out)
    assert(out.contains("c:classifier:*"), out)
    // DEFINE reading a subset variable (round 10): bare U.v carries
    // SQL:2016 RUNNING LAST semantics over the member union
    val sd = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (A+ B+) SUBSET U = (A, B)
        DEFINE A AS A.v > U.v, B AS B.v < 0)""")
    assert(sd.contains("'A:v > __mrh_0;B:v < 0'"), sd)
    assert(sd.contains("'__mrh_0:last:A|B:v'"), sd)
    // SKIP TO a subset is supported since round 10 (member union)
    val ok = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        AFTER MATCH SKIP TO LAST U
        PATTERN (A+ B+) SUBSET U = (A, B)
        DEFINE A AS A.v > 0, B AS B.v < 0)""")
    assert(ok.contains("'to last A|B'"), ok)
  }

  test("ALL ROWS measures default to RUNNING; FINAL pins whole-match values") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES COUNT(*) AS n_run, FINAL COUNT(*) AS n_fin,
          RUNNING SUM(A.v) AS s_run, MATCH_NUMBER() AS mn
        ALL ROWS PER MATCH
        PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(out.contains("n_run:run_count:*"), out)
    assert(out.contains("n_fin:count:*"), out)
    assert(out.contains("s_run:run_sum:A:v"), out)
    // MATCH_NUMBER post-select keeps the ALL ROWS fixed columns
    assert(out.contains("k, ts, match_num, classifier"), out)
    // ONE ROW: RUNNING == FINAL, both accepted, no run_ prefix
    val one = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES RUNNING COUNT(*) AS n
        ONE ROW PER MATCH
        PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(one.contains("n:count:*") && !one.contains("run_"), one)
  }

  test("FIRST/LAST in DEFINE lower to histnav placeholders the matcher binds (round 10)") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (D+ U) DEFINE D AS D.v < PREV(D.v),
          U AS U.v > FIRST(D.v) AND U.v < LAST(D.w))""")
    // distinct references dedupe into numbered placeholders; the spec
    // rides the TVF's 10th arg; PREV still windows (prePartitioned)
    assert(out.contains("'D:v < __mr_prev_v_1;U:v > __mrh_0 AND v < __mrh_1'"), out)
    assert(out.contains("'__mrh_0:first:D:v;__mrh_1:last:D:w'"), out)
    assert(out.contains("lag(v, 1) OVER"), out)
    // a repeated reference reuses its placeholder
    val dup = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (A+) DEFINE A AS A.v >= FIRST(A.v) AND A.v < FIRST(A.v) + 10)""")
    assert(dup.contains("'A:v >= __mrh_0 AND v < __mrh_0 + 10'"), dup)
    assert(dup.contains("'__mrh_0:first:A:v'"), dup)
    // pure-hist DEFINE (no PREV/NEXT): no window wrapper, matcher shuffles
    assert(dup.contains("'false', 'past last row'"), dup)
  }

  test("PREV/NEXT in MEASURES lower to last-of-symbol over the nav window column") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES PREV(A.v) AS before_last, FINAL NEXT(B.v, 2) AS after_b,
          RUNNING PREV(A.v) AS run_before
        ALL ROWS PER MATCH
        PATTERN (A+ B) DEFINE A AS A.v > 0, B AS B.v < 0)""")
    // PREV(A.v) = value one PARTITION row before LAST(A)'s row = the
    // lag window column read at that row -> [run_]last:A:<lag-col>;
    // bare measures under ALL ROWS default to RUNNING
    assert(out.contains("before_last:run_last:A:__mr_prev_v_1"), out)
    assert(out.contains("after_b:last:B:__mr_next_v_2"), out)
    assert(out.contains("run_before:run_last:A:__mr_prev_v_1"), out)
    assert(out.contains("lag(v, 1) OVER"), out)   // window wrapper rides
    assert(out.contains("lead(v, 2) OVER"), out)
  }

  test("FIRST/LAST occurrence arguments ride as a 5th measure/histnav field") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(A.v, 2) AS third_a, LAST(A.v, 1) AS second_last
        ONE ROW PER MATCH
        PATTERN (A+ B) DEFINE A AS A.v > 0,
          B AS B.v > FIRST(A.v, 1))""")
    assert(out.contains("third_a:first:A:v:2"), out)
    assert(out.contains("second_last:last:A:v:1"), out)
    assert(out.contains("'__mrh_0:first:A:v:1'"), out)
  }

  test("nested navigation composes history anchor with lag/lead offset") {
    // MEASURES: PREV(LAST(A.v)) = lag column read at LAST(A)'s row
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES FINAL PREV(LAST(A.v)) AS before_last,
          FINAL NEXT(FIRST(A.v, 1), 2) AS after_second
        PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(out.contains("before_last:last:A:__mr_prev_v_1"), out)
    assert(out.contains("after_second:first:A:__mr_next_v_2:1"), out)
    // DEFINE: the placeholder's FIELD is the window column
    val d = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (D+ U) DEFINE D AS D.v < PREV(D.v),
          U AS U.v > PREV(FIRST(D.v)))""")
    assert(d.contains("'__mrh_0:first:D:__mr_prev_v_1'"), d)
    assert(d.contains("'D:v < __mr_prev_v_1;U:v > __mrh_0'"), d)
    // arbitrary expressions inside navigation lower to a synthetic
    // source column (round 10 — previously a named rejection)
    val e = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (A) DEFINE A AS PREV(A.v + 1) > 0)""")
    assert(e.contains("(v + 1) AS __mrx_0"), e)
    assert(e.contains("'A:__mr_prev___mrx_0_1 > 0'"), e)
  }

  test("round-10 dialect: NULLS ordering, SKIP TO subset, PERMUTE, ALL ROWS sub-modes") {
    // NULLS FIRST/LAST renders into order_cols AND the nav window
    val nulls = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts DESC NULLS FIRST, seq NULLS LAST
        PATTERN (A+) DEFINE A AS A.v > PREV(A.v))""")
    assert(nulls.contains("'ts DESC NULLS FIRST,seq NULLS LAST'"), nulls)
    assert(nulls.contains("ORDER BY ts DESC NULLS FIRST, seq NULLS LAST"), nulls)
    // SKIP TO a SUBSET variable expands to the member union
    val sub = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        AFTER MATCH SKIP TO LAST U
        PATTERN (A+ B+ C) SUBSET U = (A, B)
        DEFINE A AS A.v > 0, B AS B.v < 0)""")
    assert(sub.contains("'to last A|B'"), sub)
    // PERMUTE is pattern language, not a symbol — no PERMUTE:true def
    val perm = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (PERMUTE(A, B)) DEFINE A AS A.v > 0, B AS B.v < 0)""")
    assert(perm.contains("'PERMUTE(A, B)'"), perm)
    assert(!perm.contains("PERMUTE:true"), perm)
    // ALL ROWS sub-modes lower to their own TVF modes
    def mode(clause: String): String = rewrite(
      s"""SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          $clause
          PATTERN (A+) DEFINE A AS A.v > 0)""")
    assert(mode("ALL ROWS PER MATCH SHOW EMPTY MATCHES").contains("'all_show_empty'"))
    assert(mode("ALL ROWS PER MATCH WITH UNMATCHED ROWS").contains("'all_unmatched'"))
    assert(mode("ALL ROWS PER MATCH OMIT EMPTY MATCHES").contains("'all'"))
    assert(mode("ALL ROWS PER MATCH").contains("'all_show_empty'")) // SQL:2016 default
  }

  test("navigation over expressions materializes synthetic source columns (round 10)") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES SUM(CAST(D.v < 50 AS INT)) AS nb, FIRST(D.a + D.b, 1) AS fab
        PATTERN (D+ U) DEFINE D AS D.v < PREV(D.v * 0.5),
          U AS U.v > FIRST(D.v * 1.02))""")
    // DEFINE PREV over an expression -> lag over the materialized column
    assert(out.contains("(v * 0.5) AS __mrx_0"), out)
    assert(out.contains("lag(__mrx_0, 1) OVER (PARTITION BY k ORDER BY ts) AS __mr_prev___mrx_0_1"), out)
    // DEFINE FIRST over an expression -> histnav placeholder over it
    assert(out.contains("(v * 1.02) AS __mrx_1"), out)
    assert(out.contains("__mrh_0:first:D:__mrx_1"), out)
    // MEASURES: computed SUM + FIRST with an occurrence argument
    assert(out.contains("(CAST(v < 50 AS INT)) AS __mrx_2"), out)
    assert(out.contains("nb:sum:D:__mrx_2"), out)
    assert(out.contains("(a + b) AS __mrx_3"), out)
    assert(out.contains("fab:first:D:__mrx_3:1"), out)
    // identical expression text shares ONE synthetic column
    val out2 = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (A+) DEFINE A AS A.v > PREV(A.v * 2) AND A.w > NEXT(A.v * 2))""")
    assert("__mrx_0".r.findAllIn(out2).size >= 2 && !out2.contains("__mrx_1"), out2)
    // nested: the expression arm rewrites first, then the nested
    // history-anchor + physical-offset lowering composes as usual
    val out3 = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (D+ U) DEFINE D AS D.v < PREV(D.v),
          U AS U.v > PREV(FIRST(D.v + D.w, 1), 2))""")
    assert(out3.contains("(v + w) AS __mrx_0"), out3)
    assert(out3.contains("lead") === false, out3)
    assert(out3.contains("lag(__mrx_0, 2) OVER"), out3)
    assert(out3.contains(":first:D:__mr_prev___mrx_0_2:1"), out3)
  }

  test("AVG and non-null COUNT lower as measure aggregates (round 10)") {
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES FINAL AVG(D.v) AS mean_v, COUNT(D.w) AS n_w,
          RUNNING AVG(D.v * 2) AS run2
        ALL ROWS PER MATCH
        PATTERN (D+) DEFINE D AS D.v > 0)""")
    assert(out.contains("mean_v:avg:D:v"), out)         // explicit FINAL
    assert(out.contains("n_w:run_countf:D:w"), out)     // ALL ROWS default = RUNNING
    assert(out.contains("(v * 2) AS __mrx_0"), out)     // computed AVG argument
    assert(out.contains("run2:run_avg:D:__mrx_0"), out)
  }

  test("CLASSIFIER()/MATCH_NUMBER() in DEFINE lower to matcher placeholders (round 11)") {
    // bare CLASSIFIER() is the candidate row's tentative label = the
    // symbol being defined — a constant, folded to a string literal;
    // the navigating forms and MATCH_NUMBER() ride the histnav spec
    val out = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        PATTERN (A B+) DEFINE A AS A.v < 0,
          B AS PREV(CLASSIFIER()) = 'A' AND MATCH_NUMBER() <= 3
            AND CLASSIFIER() = 'B')""")
    assert(out.replaceAll("""\s+""", " ")
      .contains("__mrh_0 = ''A'' AND __mrh_1 <= 3 AND ''B'' = ''B''"), out)
    assert(out.contains("'__mrh_0:clsprev:*:-:1;__mrh_1:matchnum:*:-'"), out)
    // pure-classifier DEFINE: no window wrapper needed
    assert(out.contains("'false', 'past last row'"), out)
    // FIRST/LAST(CLASSIFIER([S])[, k]) and CLASSIFIER(SUBSET) = LAST
    val out2 = rewrite("""SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        SUBSET W = (A, B)
        PATTERN ((A | B)+ C) DEFINE A AS A.v < 0, B AS B.v >= 0,
          C AS FIRST(CLASSIFIER()) = 'A' AND LAST(CLASSIFIER(W), 1) = 'B'
            AND CLASSIFIER(W) = 'B' AND PREV(CLASSIFIER(), 2) = 'A')""")
    // placeholder numbering follows pass order (PREV forms first)
    assert(out2.contains(
      "'__mrh_0:clsprev:*:-:2;__mrh_1:cls_first:*:-;__mrh_2:cls_last:A|B:-:1;__mrh_3:cls_last:A|B:-'"),
      out2)
  }

  test("unsupported forms fail loudly with the feature named") {
    def err(body: String): String =
      intercept[Exception](rewrite(
        s"SELECT * FROM t MATCH_RECOGNIZE ($body)")).getMessage
    assert(err("PARTITION BY k ORDER BY ts ALL ROWS PER MATCH HALFWAY PATTERN (A) DEFINE A AS A.v > 0")
      .contains("ALL ROWS PER MATCH"))
    assert(err("PARTITION BY k ORDER BY ts SUBSET U = (A, Z) PATTERN (A) DEFINE A AS A.v > 0")
      .contains("SUBSET member"))
    assert(err("PARTITION BY k ORDER BY ts AFTER MATCH SKIP HALFWAY PATTERN (A) DEFINE A AS A.v > 0")
      .contains("AFTER MATCH"))
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A B) DEFINE A AS NEXT(A.v + B.w) > 0")
      .contains("SAME pattern variable"))
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A) DEFINE A AS NEXT(1 + 2) > 0")
      .contains("PATTERN_SYMBOL.column"))
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A) DEFINE A AS PREV(A.v + CLASSIFIER()) > 0")
      .contains("CLASSIFIER"))
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A) DEFINE A AS NEXT(LAST(FIRST(A.v))) > 0")
      .contains("navigation"))
    // Trino-parity rejections (round 12): Trino's pattern-recognition
    // rules allow nesting ONLY logical navigation (FIRST/LAST) inside
    // physical (PREV/NEXT) — these spellings are invalid THERE too, so
    // rejecting them is dialect parity, not a gap
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A B) DEFINE B AS PREV(PREV(A.v)) > 0")
      .contains("navigation"))
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A B) DEFINE B AS FIRST(LAST(A.v)) > 0")
      .contains("navigation"))
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A B) DEFINE B AS LAST(PREV(A.v)) > 0")
      .contains("navigation"))
    assert(err("PARTITION BY k ORDER BY ts MEASURES FIRST(PREV(A.v)) AS m PATTERN (A B) DEFINE A AS A.v > 0")
      .contains("navigation"))
    // round 11: classifier corners that stay out, named loudly
    assert(err("PARTITION BY k ORDER BY ts PATTERN (A B) DEFINE B AS NEXT(CLASSIFIER()) = 'A'")
      .contains("not yet classified"))
    assert(err("PARTITION BY k ORDER BY ts SUBSET W = (A, B) PATTERN (A B) DEFINE B AS PREV(CLASSIFIER(W)) = 'A'")
      .contains("set-qualified"))
    // r10-ADVICE: aggregates inside a navigated DEFINE expression used
    // to lower into the source projection and die opaquely later
    assert(err("PARTITION BY k ORDER BY ts PATTERN (D+ U) DEFINE U AS U.v > FIRST(MIN(D.v))")
      .contains("navigated expression"))
    assert(err("PARTITION BY k ORDER BY ts MEASURES PREV(A.v + B.v) AS pv PATTERN (A B) DEFINE A AS A.v > 0")
      .contains("SAME pattern variable"))
    assert(err("PARTITION BY k ORDER BY ts MEASURES MIN(A.v, 2) AS m PATTERN (A) DEFINE A AS A.v > 0")
      .contains("occurrence argument"))
    assert(err("PARTITION BY k ORDER BY ts MEASURES COUNT(A.v + 1) AS c PATTERN (A) DEFINE A AS A.v > 0")
      .contains("MEASURES expression")) // COUNT takes *, S.* or a plain S.col
    assert(err("ORDER BY ts PATTERN (A) DEFINE A AS A.v > 0")
      .contains("PARTITION BY"))
  }
}
