package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.{JsonTableSql, MatchRecognizeSql, UnnestSql}

/** Property tests for the parser-seam rewriters: EVERY statement in a
  * graft session passes through MatchRecognizeSql -> JsonTableSql ->
  * UnnestSql (GraftSqlParser), so the identity guarantee — statements
  * whose keywords appear only inside string literals, quoted
  * identifiers, or comments are returned byte-for-byte — is
  * load-bearing for the whole engine, not just for the dialect
  * features. Seeded pureApply generation (repo convention: no ambient
  * randomness). No SparkSession needed — pure string functions.
  */
class RewriterPropertySpec extends AnyFunSuite {

  private val ident = Gen.oneOf("a", "tbl", "x1", "order_key", "v")
  private val keywordish = Gen.oneOf(
    "JSON_TABLE(doc)", "UNNEST(arr) AS u(x)", "json_table(x,",
    "unnest(a, b)", "MATCH_RECOGNIZE (", "JSON_TABLE ( 'lax $[*]'")

  /** Fragments where keywords are MASKED territory. */
  private val maskedFrag: Gen[String] = for {
    kw <- keywordish
    shape <- Gen.oneOf(0, 1, 2, 3, 4)
  } yield shape match {
    case 0 => s"'$kw'"                      // string literal
    case 1 => s"-- $kw\n"                   // line comment
    case 2 => s"/* $kw */"                  // block comment
    case 3 => s"/* outer /* $kw */ end */"  // nested block comment
    case 4 => s"`$kw`"                      // backtick identifier
  }

  private val plainFrag: Gen[String] = Gen.oneOf(
    Gen.const("SELECT "), ident, Gen.const(" FROM "), Gen.const(", "),
    Gen.const(" WHERE x = 1 "), Gen.const("count(*)"), Gen.const("("),
    Gen.const(")"), Gen.const(" UNION ALL "), Gen.const("'it''s'"),
    Gen.const("\n"), Gen.const("cast(x as int)"))

  private val stmtGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    frags <- Gen.listOfN(n, Gen.frequency(3 -> plainFrag, 1 -> maskedFrag))
  } yield frags.mkString

  test("backslash-escaped quotes keep the literal open (Spark's default lexer)") {
    // spark.sql.parser.escapedStringLiterals defaults to FALSE, which
    // means backslash escapes ARE honored: '\'' stays inside the
    // literal, so keyword text after it is still masked (r12 review)
    val stmts = Seq(
      "SELECT 'don\\'t UNNEST(a b' AS s FROM t",
      "SELECT \"we\\\"ird JSON_TABLE(doc\" FROM t",
      "SELECT 'a\\\\' , x FROM t -- backslash then close: UNNEST(q)\n")
    stmts.foreach { s =>
      assert(UnnestSql.rewrite(s) == s, s"Unnest changed: <$s>")
      assert(JsonTableSql.rewrite(s) == s, s"JsonTable changed: <$s>")
      assert(MatchRecognizeSql.rewrite(
        s + " /* MATCH_RECOGNIZE ( */") == s + " /* MATCH_RECOGNIZE ( */")
    }
  }

  test("keywords inside literals/comments/quoted identifiers never trigger a rewrite") {
    for (i <- 0 until 800) {
      val stmt = stmtGen.pureApply(Gen.Parameters.default, Seed(42L + i))
      assert(JsonTableSql.rewrite(stmt) == stmt, s"JsonTable changed: <$stmt>")
      assert(UnnestSql.rewrite(stmt) == stmt, s"Unnest changed: <$stmt>")
      assert(MatchRecognizeSql.rewrite(stmt) == stmt, s"MR changed: <$stmt>")
    }
  }

  test("rewrites are idempotent: a lowered statement re-lowers to itself") {
    val jt = """SELECT d.id, t.ln FROM docs d, JSON_TABLE(d.doc, 'lax $[*]'
      COLUMNS (ln INTEGER PATH 'lax $.ln')) AS t"""
    val un = """SELECT u.x, u.pos FROM t CROSS JOIN UNNEST(t.arr)
      WITH ORDINALITY AS u(x, pos)"""
    val jt1 = JsonTableSql.rewrite(jt)
    assert(JsonTableSql.rewrite(jt1) == jt1)
    val un1 = UnnestSql.rewrite(un)
    assert(UnnestSql.rewrite(un1) == un1)
    // and the full chain composes without interference
    val chained = UnnestSql.rewrite(JsonTableSql.rewrite(jt + " UNION ALL " + un))
    assert(UnnestSql.rewrite(JsonTableSql.rewrite(chained)) == chained)
  }

  test("a rejected spelling still names the feature after random masked prefixes") {
    // rejection quality must survive arbitrary masked content earlier
    // in the statement (offset bookkeeping)
    for (i <- 0 until 100) {
      val prefix = maskedFrag.pureApply(Gen.Parameters.default, Seed(900L + i))
      val e = intercept[Exception] {
        UnnestSql.rewrite(s"SELECT $prefix x FROM t, UNNEST(arr)")
      }
      assert(e.getMessage.contains("alias"), s"prefix <$prefix>: ${e.getMessage}")
    }
  }
}
