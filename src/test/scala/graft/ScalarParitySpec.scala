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

  test("width_bucket / luhn_check stay NATIVE — registration must not shadow them (r13)") {
    // Spark 4 ships both builtins; graft deliberately does NOT register
    // either name (a registry entry would shadow the native expression
    // and change its contract). Dialect delta pinned here: Trino ERRORS
    // on a non-positive bucket count / non-digit input, Spark's natives
    // return NULL / false — graft keeps the native semantics.
    val s = registered
    val r = s.sql("""SELECT width_bucket(3.14, 0, 4, 3) AS a,
                            width_bucket(-1, 0, 4, 3) AS lo,
                            width_bucket(4, 0, 4, 3) AS hi,
                            width_bucket(3.14, 4, 0, 3) AS dsc""").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 1L) // descending: near the FIRST bound
    assert(s.sql("SELECT width_bucket(1, 0, 4, 0) AS n").head().isNullAt(0))
    // 79927398713 is the canonical Luhn-valid example; +1 breaks it
    val l = s.sql("""SELECT luhn_check('79927398713') AS ok,
                            luhn_check('79927398714') AS bad,
                            luhn_check('4242x') AS nondigit""").head()
    assert(l.getBoolean(0) && !l.getBoolean(1) && !l.getBoolean(2))
  }

  test("big-endian 64 pair: sortable encoding, exact roundtrip incl. negatives (r13)") {
    val s = registered
    val r = s.sql("""SELECT hex(to_big_endian_64(255)) AS h,
                            from_big_endian_64(to_big_endian_64(-7)) AS neg,
                            from_big_endian_64(to_big_endian_64(0)) AS z""").head()
    assert(r.getString(0) == "00000000000000FF")
    assert(r.getLong(1) == -7L && r.getLong(2) == 0L)
    // the encoding is unsigned-byte-order sortable for non-negative longs
    val pairs = s.sql("""SELECT to_big_endian_64(3) AS a, to_big_endian_64(200) AS b""").head()
    assert(java.util.Arrays.compareUnsigned(
      pairs.getAs[Array[Byte]](0), pairs.getAs[Array[Byte]](1)) < 0)
    intercept[Exception] { s.sql("SELECT from_big_endian_64(X'0102')").collect() }
  }

  test("cosine_similarity(map, map): identity 1, disjoint 0, zero-norm NaN, null values (r13)") {
    val s = registered
    val r = s.sql("""SELECT
        cosine_similarity(map('a', 1D, 'b', 2D), map('a', 1D, 'b', 2D)) AS same,
        cosine_similarity(map('a', 1D), map('b', 1D)) AS disjoint,
        cosine_similarity(map('a', 3D), map('a', 4D)) AS colinear,
        cosine_similarity(map('a', 0D), map('a', 1D)) AS zeronorm,
        cosine_similarity(map('a', 1D, 'b', CAST(NULL AS DOUBLE)),
                          map('a', 1D, 'b', 5D)) AS nulled""").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getDouble(3).isNaN) // 0/0 — Trino's natural arithmetic
    // NULL values excluded from dot AND norms: behaves as map('a', 1)
    assert(math.abs(r.getDouble(4) - (1.0 / math.sqrt(26.0))) < 1e-12)
    // int-valued maps coerce through the cast
    assert(math.abs(s.sql("SELECT cosine_similarity(map('x', 2), map('x', 5)) AS c")
      .head().getDouble(0) - 1.0) < 1e-12)
  }

  test("great_circle_distance: zero at identity, symmetric, known city pair (r13)") {
    val s = registered
    val r = s.sql("""SELECT great_circle_distance(48.8566, 2.3522, 48.8566, 2.3522) AS zero,
                            great_circle_distance(36.12, -86.67, 33.94, -118.40) AS ab,
                            great_circle_distance(33.94, -118.40, 36.12, -86.67) AS ba""").head()
    assert(r.getDouble(0) == 0.0)
    // BNA->LAX, the haversine literature example: ~2886.4 km at r=6371.01
    assert(math.abs(r.getDouble(1) - 2886.4) < 1.0, r.getDouble(1))
    assert(r.getDouble(1) == r.getDouble(2))
    intercept[Exception] { s.sql("SELECT great_circle_distance(91, 0, 0, 0)").collect() }
  }
}
