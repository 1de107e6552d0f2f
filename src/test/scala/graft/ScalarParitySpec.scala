package graft

/** Trino scalar parity batch 2 (round 12, functions/ScalarParity.scala
  * StaticInvoke kernels): contract errors are loud (Trino semantics),
  * NULLs propagate, unicode is handled at code-point grain, and the
  * kernels stay inside whole-stage codegen (StaticInvoke, no UDF).
  */
class ScalarParitySpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("hamming_distance counts code-point mismatches; unequal lengths error loudly") {
    val s = registered
    assert(s.sql("SELECT hamming_distance('karolin', 'kathrin') AS d")
      .head().getLong(0) == 3L)
    // astral-plane code points count as ONE position each
    assert(s.sql("SELECT hamming_distance('a😀b', 'a😁b') AS d")
      .head().getLong(0) == 1L)
    val e = intercept[Exception] {
      s.sql("SELECT hamming_distance('ab', 'abc')").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("equal-length") ||
      Option(e.getCause).exists(_.getMessage.contains("equal-length")))
  }

  test("normalize defaults to NFC; explicit forms work; bad form errors") {
    val s = registered
    // U+0065 U+0301 (e + combining acute) NFC-composes to U+00E9
    assert(s.sql("SELECT normalize('é') AS n").head().getString(0) == "é")
    assert(s.sql("SELECT normalize('é', 'NFD') AS n")
      .head().getString(0) == "é")
    intercept[Exception] {
      s.sql("SELECT normalize('x', 'NFX')").collect()
    }
  }

  test("codepoint requires exactly one character; from_base/to_base roundtrip with bounds") {
    val s = registered
    assert(s.sql("SELECT codepoint('€') AS c").head().getInt(0) == 0x20ac)
    intercept[Exception] { s.sql("SELECT codepoint('ab')").collect() }
    assert(s.sql("SELECT to_base(255, 16) AS x").head().getString(0) == "ff")
    assert(s.sql("SELECT from_base('ff', 16) AS x").head().getLong(0) == 255L)
    assert(s.sql("SELECT from_base('-101', 2) AS x").head().getLong(0) == -5L)
    intercept[Exception] { s.sql("SELECT to_base(1, 99)").collect() }
    // NULL propagates instead of calling the kernel
    assert(s.sql("SELECT codepoint(CAST(NULL AS STRING)) AS c").head().isNullAt(0))
  }

  test("last_day_of_month and week_of_year match Spark-native date kernels") {
    val s = registered
    val r = s.sql("""SELECT last_day_of_month(TIMESTAMP'1996-02-10 12:00:00') AS eom,
                            week_of_year(DATE'1996-01-01') AS woy""").head()
    assert(r.getDate(0).toString == "1996-02-29")
    assert(r.getInt(1) == 1)
  }
}
