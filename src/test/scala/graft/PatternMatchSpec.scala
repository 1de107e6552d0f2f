package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.PatternMatch
import graft.operators.PatternMatch.{Measure, findMatches, parse}

/** Row-pattern matcher (MATCH_RECOGNIZE subset): parser, NFA semantics
  * (greedy quantifiers, leftmost match, skip past last row), classifier
  * assignment, measures, and the end-to-end DataFrame operator.
  */
class PatternMatchSpec extends SparkSpec {

  private def truthOf(s: String, syms: String): Array[Array[Boolean]] =
    s.map(c => syms.map(_ == c).toArray).toArray

  // one symbol per char: rows spelled as a string, e.g. "DDUU"
  private def spans(rows: String, syms: String, pattern: String): Seq[(Int, Int)] =
    findMatches(truthOf(rows, syms), parse(pattern, syms.map(_.toString)))
      .map(m => (m.start, m.end))

  test("plus quantifier is greedy and skips past last row") {
    assert(spans("DDUUDU", "DU", "D+ U+") === Seq((0, 4), (4, 6)))
  }

  test("non-matching rows advance the start point") {
    assert(spans("XDDUX", "DUX", "D+ U+") === Seq((1, 4)))
  }

  test("alternation and optional") {
    assert(spans("ABC", "ABC", "A (B | C) C?") === Seq((0, 3)))
    assert(spans("ACB", "ABC", "A (B | C) B?") === Seq((0, 3)))
  }

  test("bounded quantifier {n,m} prefers more") {
    assert(spans("AAAA", "A", "A{2,3}") === Seq((0, 3)))
    assert(spans("AAAA", "A", "A{1,}") === Seq((0, 4)))
    assert(spans("AA", "A", "A{3}") === Seq())
  }

  test("star matches zero occurrences but a match must consume rows") {
    // B* alone can match empty at every position -> no rows consumed, no matches
    assert(spans("AAA", "AB", "B*") === Seq())
    assert(spans("ABBA", "AB", "A B*") === Seq((0, 3), (3, 4)))
  }

  test("backtracking: greedy rep gives back rows for the suffix") {
    // A+ A: the + must give one A back
    assert(spans("AAA", "A", "A+ A") === Seq((0, 3)))
  }

  test("classifier assigns winning-path symbols with overlapping predicates") {
    // rows where BOTH symbols hold: pattern decides the classification
    val truth = Array(Array(true, true), Array(true, true), Array(false, true))
    val ms = findMatches(truth, parse("A+ B+", Seq("A", "B")))
    assert(ms.map(m => (m.start, m.end, m.cls.toSeq)) === Seq((0, 3, Seq(0, 0, 1))))
  }

  test("bounded quantifier over an optional group admits empty iterations (SQL:2016)") {
    // (A?){2} over one A row: one consuming iteration + one empty
    // iteration satisfies the {2}
    assert(spans("A", "A", "(A?){2}") === Seq((0, 1)))
    assert(spans("AB", "AB", "(A?){3} B") === Seq((0, 2)))
  }

  test("long monotone head run is linear, not quadratic (no budget blowout)") {
    // 20k falling rows with no rise: naive backtracking is O(run^2)
    // ~ 6e8 steps (budget blowout); the head-run start skip makes it
    // one pass
    val truth = Array.fill(20000)(Array(true, false)) // all D, never U
    val ms = findMatches(truth, parse("D+ U+", Seq("D", "U")))
    assert(ms.isEmpty)
    // and a run that DOES end in a rise still matches greedily
    val truth2 = Array.fill(19999)(Array(true, false)) :+ Array(false, true)
    val ms2 = findMatches(truth2, parse("D+ U+", Seq("D", "U")))
    assert(ms2.map(m => (m.start, m.end)) === Seq((0, 20000)))
  }

  test("unknown symbol and syntax errors fail fast") {
    intercept[RuntimeException](parse("A Q", Seq("A")))
    intercept[RuntimeException](parse("A (B", Seq("A", "B")))
  }

  test("end-to-end operator: V-pattern over a keyed ordered frame") {
    import spark.implicits._
    // key 1: 10,8,6,9,11 -> one V (2 down, 2 up); key 2: rising only
    val df = Seq(
      (1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 11.0),
      (2, 1, 1.0), (2, 2, 2.0), (2, 3, 3.0))
      .toDF("k", "seq", "v")
      .withColumn("delta", col("v") - lag(col("v"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")))
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("D" -> (col("delta") < 0), "U" -> (col("delta") > 0)),
      pattern = "D+ U+",
      measures = Seq(
        Measure("n_down", "count", "D"),
        Measure("n_up", "count", "U"),
        Measure("bottom", "last", "D", "v"),
        Measure("peak", "max", "U", "v"),
        Measure("total", "sum", "*", "v")))
    val rows = out.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(rows === Seq((1, 1L, 2L, 2L, 6.0, 11.0, 8.0 + 6.0 + 9.0 + 11.0)))
  }

  test("DECIMAL measures aggregate exactly in the native type (r4 advice)") {
    import spark.implicits._
    // DECIMAL(38,2) prices a real user has; values chosen so a double
    // round-trip would be tempted to drift (.10 + .20 + .30 != 0.6 in
    // binary floating point) and so the sum crosses an integer-digit
    // boundary. Two runs per key: run of rising then one falling row.
    val df = Seq(
      (1, 1, "99999999999999999999999999999999.10"),
      (1, 2, "0.20"), (1, 3, "0.30"), (1, 4, "-5.00"),
      (2, 1, "1.10"), (2, 2, "2.20"), (2, 3, "-0.01"))
      .toDF("k", "seq", "p")
      .withColumn("price", col("p").cast(DecimalType(38, 2)))
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> (col("price") > 0), "B" -> (col("price") < 0)),
      pattern = "A+ B",
      measures = Seq(
        Measure("total", "sum", "A", "price"),
        Measure("lo", "min", "A", "price"),
        Measure("hi", "max", "A", "price"),
        Measure("dip", "first", "B", "price")))
    // output types: min/max/first keep DECIMAL(38,2); sum widens by the
    // same +10-capped-38 rule Spark's Sum uses -> DECIMAL(38,2) here
    assert(out.schema("total").dataType == DecimalType(38, 2))
    assert(out.schema("lo").dataType == DecimalType(38, 2))
    // window-emulation oracle: the same measures computed by Spark's
    // own DECIMAL Sum/Min/Max aggregates (an entirely different code
    // path — Catalyst Decimal arithmetic vs the matcher's BigDecimal)
    val expect = df.filter(col("price") > 0).groupBy("k")
      .agg(sum("price").as("total"), min("price").as("lo"), max("price").as("hi"))
      .collect().map(r => r.getInt(0) ->
        (r.getDecimal(1), r.getDecimal(2), r.getDecimal(3))).toMap
    val got = out.collect().map(r => r.getInt(0) ->
      (r.getDecimal(2), r.getDecimal(3), r.getDecimal(4), r.getDecimal(5))).toMap
    assert(got.keySet == Set(1, 2))
    for (k <- Seq(1, 2)) {
      val (et, el, eh) = expect(k)
      val (t, l, h, dip) = got(k)
      assert(t.compareTo(et) == 0, s"k=$k sum: $t != $et")
      assert(l.compareTo(el) == 0, s"k=$k min: $l != $el")
      assert(h.compareTo(eh) == 0, s"k=$k max: $h != $eh")
      assert(dip.signum() < 0, s"k=$k first(B): $dip")
    }
    // exactness witness: the fractional sum is exactly .60, not a float
    // neighborhood of it
    assert(got(1)._1.remainder(java.math.BigDecimal.ONE).abs()
      .compareTo(new java.math.BigDecimal("0.60")) == 0, got(1)._1)
  }

  test("ALL ROWS PER MATCH emits matched rows with classifiers, omits the rest") {
    import spark.implicits._
    // key 1: V shape (rows 2-5 matched); key 2: rising only, but the
    // first row (null delta) is unmatched -> rows 2-3 matched
    val df = Seq(
      (1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 11.0),
      (2, 1, 1.0), (2, 2, 2.0), (2, 3, 3.0))
      .toDF("k", "seq", "v")
      .withColumn("delta", col("v") - lag(col("v"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")))
    val out = PatternMatch.matchPatternAllRows(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("D" -> (col("delta") < 0), "U" -> (col("delta") > 0)),
      pattern = "D+ U+")
    val rows = out.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(rows === Seq(
      (1, 2, 1L, "D"), (1, 3, 1L, "D"), (1, 4, 1L, "U"), (1, 5, 1L, "U")))
    // key 2 has no D run -> no match at all; key 1 row 1 unmatched
  }

  test("SKIP TO NEXT ROW yields overlapping matches, one per qualifying start") {
    def next(rows: String, syms: String, pattern: String): Seq[(Int, Int)] =
      findMatches(truthOf(rows, syms), parse(pattern, syms.map(_.toString)),
        PatternMatch.SkipToNextRow).map(m => (m.start, m.end))
    // every suffix of the D run pairs with the adjacent U run
    assert(next("DDUU", "DU", "D+ U+") === Seq((0, 4), (1, 4)))
    assert(next("DDUUDU", "DU", "D+ U+") === Seq((0, 4), (1, 4), (4, 6)))
    // skip-past-last baseline is unchanged (default param)
    assert(spans("DDUU", "DU", "D+ U+") === Seq((0, 4)))
    // the head-run failure skip still applies between matches
    assert(next("DDDD", "DU", "D+ U+") === Seq())
    // classifier of each overlapping match covers exactly its own span
    val ms = findMatches(truthOf("DDUU", "DU"),
      parse("D+ U+", Seq("D", "U")), PatternMatch.SkipToNextRow)
    assert(ms.map(_.cls.toSeq) === Seq(Seq(0, 0, 1, 1), Seq(0, 1, 1)))
  }

  test("SKIP TO FIRST/LAST symbol resumes AT the mapped row; standard errors are loud") {
    def sk(rows: String, syms: String, pattern: String, spec: String): Seq[(Int, Int)] =
      findMatches(truthOf(rows, syms), parse(pattern, syms.map(_.toString)),
        PatternMatch.parseSkip(spec, syms.map(_.toString)))
        .map(m => (m.start, m.end))
    // D+ U+ over DDUUDU, SKIP TO LAST U: match [0,4) resumes AT row 3
    // (last U) — row 3 is U so D+ fails there, head-run skip advances,
    // next match [4,6)
    assert(sk("DDUUDU", "DU", "D+ U+", "to last U") === Seq((0, 4), (4, 6)))
    // SKIP TO FIRST U on the same stream: resume at row 2 (first U)
    assert(sk("DDUUDU", "DU", "D+ U+", "to first U") === Seq((0, 4), (4, 6)))
    // A B A B with SKIP TO LAST A: match [0,2) resumes at... last A is
    // row 0 = match start -> SQL:2016 infinite-loop error
    val loop = intercept[Exception](sk("ABAB", "AB", "A B", "to last A"))
    assert(loop.getMessage.contains("first row"), loop.getMessage)
    // pattern where the skip symbol maps no row: B? never matches
    val none = intercept[Exception](sk("AA", "AB", "A B?", "to last B"))
    assert(none.getMessage.contains("no row"), none.getMessage)
    // unknown symbol in the spec
    val unk = intercept[Exception](PatternMatch.parseSkip("to first Z", Seq("A", "B")))
    assert(unk.getMessage.contains("unknown"), unk.getMessage)
  }

  test("ALL ROWS measures: RUNNING prefixes per row, FINAL constants per match") {
    import spark.implicits._
    val df = Seq((1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 11.0))
      .toDF("k", "seq", "v")
      .withColumn("delta", col("v") - lag(col("v"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")))
    val out = PatternMatch.matchPatternAllRows(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("D" -> (col("delta") < 0), "U" -> (col("delta") > 0)),
      pattern = "D+ U+",
      measures = Seq(
        Measure("n_run", "count", "*", running = true),
        Measure("min_run", "min", "*", "v", running = true),
        Measure("n_down_fin", "count", "D"),
        Measure("peak_fin", "last", "U", "v"),
        Measure("cls_run", "classifier", "*", running = true)))
    // cols: k(0), seq(1), match_num(2), classifier(3), then measures
    val rows = out.collect().map(r => (r.getInt(1), r.getLong(4), r.getDouble(5),
      r.getLong(6), r.getDouble(7), r.getString(8))).sortBy(_._1).toSeq
    // match rows: seq 2..5 (D,D,U,U); running count 1..4; running min
    // 8,6,6,6; finals constant: n_down=2, peak=11.0
    assert(rows === Seq(
      (2, 1L, 8.0, 2L, 11.0, "D"),
      (3, 2L, 6.0, 2L, 11.0, "D"),
      (4, 3L, 6.0, 2L, 11.0, "U"),
      (5, 4L, 6.0, 2L, 11.0, "U")))
  }

  test("measure symbol unions (SUBSET spelling) aggregate across member symbols") {
    def one(rows: String, syms: String, pattern: String,
            ms: Seq[Measure]): Seq[Seq[Any]] = {
      import spark.implicits._
      val df = rows.zipWithIndex.map { case (c, i) => (1, i, c.toString) }
        .toDF("k", "seq", "t")
      PatternMatch.matchPattern(df, Seq("k"), Seq("seq"),
        syms.map(c => c.toString -> (col("t") === c.toString)),
        pattern, ms).collect().map(_.toSeq.drop(2)).toSeq
    }
    val got = one("AABB", "AB", "A+ B+", Seq(
      Measure("n_union", "count", "A|B"),
      Measure("n_a", "count", "A"),
      Measure("last_u", "last", "A|B", "seq")))
    assert(got === Seq(Seq(4L, 2L, 3)))
    val bad = intercept[Exception](one("AABB", "AB", "A+ B+",
      Seq(Measure("n", "count", "A|Z"))))
    assert(bad.getMessage.contains("unknown pattern symbol"), bad.getMessage)
  }

  test("DESC order specs reverse the stream the matcher walks") {
    import spark.implicits._
    // seq-ascending values 10,5,8: ASC stream has D at seq2, U at seq3;
    // DESC stream is 8,5,10 — D at seq2 (5<8), U at seq1 (10>5), so the
    // match covers the same rows but FIRST/LAST swap roles.
    val df = Seq((1, 1, 10.0), (1, 2, 5.0), (1, 3, 8.0)).toDF("k", "seq", "v")
      .withColumn("prev_v", lag(col("v"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col("seq").desc)))
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq DESC"),
      symbols = Seq("D" -> (col("v") < col("prev_v")),
        "U" -> (col("v") > col("prev_v"))),
      pattern = "D+ U+",
      measures = Seq(
        Measure("first_seq", "first", "*", "seq"),
        Measure("last_seq", "last", "*", "seq"),
        Measure("bottom", "last", "D", "v"),
        Measure("peak", "last", "U", "v")))
    val rows = out.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    // DESC stream: first row of the match is seq=2, last is seq=1
    assert(rows === Seq((1, 1L, 2, 1, 5.0, 10.0)))
    // malformed order specs fail loudly
    val e = intercept[Exception](PatternMatch.matchPattern(df,
      Seq("k"), Seq("seq SIDEWAYS"),
      Seq("D" -> (col("v") < 0)), "D", Nil))
    assert(e.getMessage.contains("order spec"))
  }

  test("double measures order NaN as greatest (total order, like Spark Min/Max)") {
    import spark.implicits._
    // r9 review: math.min would poison MIN with NaN; the total order
    // (Spark's own and DuckDB's) treats NaN as greatest, so MIN over
    // [NaN, 1.0] is 1.0 and MAX surfaces the NaN
    val df = Seq((1, 1, Double.NaN), (1, 2, 1.0), (1, 3, 2.0)).toDF("k", "seq", "v")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> lit(true)), pattern = "A+",
      measures = Seq(Measure("mn", "min", "*", "v"), Measure("mx", "max", "*", "v")))
    val r = out.collect().head
    assert(r.getDouble(2) == 1.0, r)
    assert(r.getDouble(3).isNaN, r)
  }

  test("multiple matches number sequentially per key") {
    import spark.implicits._
    val df = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"))
      .toDF("k", "seq", "t")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> (col("t") === "a"), "B" -> (col("t") === "b")),
      pattern = "A B",
      measures = Seq(Measure("n", "count", "*")))
    assert(out.select("match_num").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("all-optional patterns stay linear over large non-matching groups") {
    // "D* U*" empty-matches at every start; must be O(n), not O(n^2)
    val truth = Array.fill(50000)(Array(false, false))
    assert(findMatches(truth, parse("D* U*", Seq("D", "U"))).isEmpty)
  }

  test("min/max/sum over BIGINT beyond 2^53 stay exact (long arithmetic, no double round-trip)") {
    import spark.implicits._
    val big = (1L << 60) + 1L // double ulp here is 256: a round-trip corrupts it
    val df = Seq((1, 1, big), (1, 2, big + 1L), (1, 3, big + 2L))
      .toDF("k", "seq", "id")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> col("id").isNotNull), pattern = "A+",
      measures = Seq(
        Measure("lo", "min", "*", "id"),
        Measure("hi", "max", "*", "id"),
        Measure("tot", "sum", "*", "id"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("lo") == big && r.getAs[Long]("hi") == big + 2L, r)
    assert(r.getAs[Long]("tot") == 3L * big + 3L, r)

    // transient intermediate overflow of a REPRESENTABLE sum succeeds
    // (BigInt accumulation is order-independent)...
    val df3 = Seq((1, 1, Long.MaxValue), (1, 2, 1L), (1, 3, -2L)).toDF("k", "seq", "id")
    val ok = PatternMatch.matchPattern(df3,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> col("id").isNotNull), pattern = "A+",
      measures = Seq(Measure("tot", "sum", "*", "id"))).collect()
    assert(ok.head.getAs[Long]("tot") == Long.MaxValue - 1L, ok.head)

    // ...while a sum that would WRAP Long raises instead of returning garbage
    val huge = Long.MaxValue / 2 + 1L
    val df2 = Seq((1, 1, huge), (1, 2, huge), (1, 3, huge)).toDF("k", "seq", "id")
    val out2 = PatternMatch.matchPattern(df2,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> col("id").isNotNull), pattern = "A+",
      measures = Seq(Measure("tot", "sum", "*", "id")))
    val e = intercept[Exception](out2.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.toLowerCase.contains("overflow")), msgs(e).mkString(" | "))
  }

  test("broken prePartitioned contract fails loudly, never silently fragments") {
    import spark.implicits._
    // interleaved keys in one partition: group 1 would fragment
    val df = Seq((1, 1, "a"), (2, 1, "a"), (1, 2, "a")).toDF("k", "seq", "t").coalesce(1)
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> (col("t") === "a")), pattern = "A",
      measures = Seq(Measure("n", "count", "*")),
      prePartitioned = true)
    val e = intercept[Exception](out.collect())
    assert(e.getMessage.contains("fragmented") ||
      Option(e.getCause).exists(_.getMessage.contains("fragmented")), e.getMessage)
  }

  test("matcher agrees with java.util.regex on 500 random (string, pattern) cases") {
    // Java regex is ALSO a leftmost-greedy backtracking engine, and
    // Matcher.find() continues past the last match — exactly ONE ROW
    // PER MATCH + AFTER MATCH SKIP PAST LAST ROW over a
    // one-symbol-per-row alphabet. Cross-check spans on random inputs.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val symGen = Gen.oneOf("A", "B", "C")
    val atomGen: Gen[String] = for {
      s <- symGen
      q <- Gen.oneOf("", "", "+", "*", "?", "{2}", "{1,3}", "{2,}")
    } yield s + q
    val patGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 4)
      atoms <- Gen.listOfN(n, atomGen)
      alt <- Gen.oneOf(true, false)
      altSym <- symGen
    } yield {
      val base = atoms.mkString(" ")
      if (alt) s"($base | $altSym $altSym)" else base
    }
    val rowsGen = for {
      len <- Gen.chooseNum(0, 24)
      s <- Gen.listOfN(len, Gen.oneOf('A', 'B', 'C', 'X'))
    } yield s.mkString
    for (i <- 0 until 500) {
      val pat = patGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(5000L + i))
      val got = spans(rows, "ABCX", pat)
      // same pattern as a Java regex (strip spaces; symbols are chars)
      val jre = java.util.regex.Pattern.compile(pat.replace(" ", ""))
      val mt = jre.matcher(rows)
      val want = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var from = 0
      while (from <= rows.length && mt.find(from)) {
        if (mt.end > mt.start) { want += ((mt.start, mt.end)); from = mt.end }
        else from = mt.start + 1 // empty regex match consumes nothing
      }
      assert(got === want.toSeq, s"case $i: rows='$rows' pattern='$pat'")

      // SKIP TO NEXT ROW twin: the overlapping-match set is exactly
      // "every start with a non-empty leftmost-greedy match" — Java's
      // lookingAt() anchored at each region start computes the same
      // (the head-run failure skip only ever skips provably-failing
      // starts, so the emitted sets must agree)
      val gotNext = findMatches(truthOf(rows, "ABCX"),
        parse(pat, "ABCX".map(_.toString)), PatternMatch.SkipToNextRow)
        .map(m => (m.start, m.end))
      val wantNext = (0 until rows.length).flatMap { s0 =>
        val rm = jre.matcher(rows).region(s0, rows.length)
        if (rm.lookingAt() && rm.end > rm.start) Some((rm.start, rm.end)) else None
      }
      assert(gotNext === wantNext,
        s"skip-to-next case $i: rows='$rows' pattern='$pat'")
    }
  }

  test("FIRST(sym.col) in DEFINE: recover-above-fall-start funnel (round 10)") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // k=1: 10,8,6,9 — D run (8,6); U=9 > FIRST(D.v)=8 from start row 1
    // k=2: 10,6,5 — decline never recovers: no successor row, no match
    // k=3: 10,9,3,4 — from row 1, FIRST(D.v)=9 > 4 fails; the matcher
    //      must RETRY at row 2 (history is start-dependent — this is
    //      the case the disabled head-run skip would have broken):
    //      FIRST(D.v)=3 < 4 matches
    val df = Seq(
      (1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0),
      (2, 1, 10.0), (2, 2, 6.0), (2, 3, 5.0),
      (3, 1, 10.0), (3, 2, 9.0), (3, 3, 3.0), (3, 4, 4.0))
      .toDF("k", "seq", "v")
      .withColumn("delta", col("v") - lag(col("v"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")))
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq(
        "D" -> (col("delta") < 0),
        "U" -> (col("v") > col("__nav_first_d_v"))),
      pattern = "D+ U",
      measures = Seq(
        Measure("dip_start", "first", "D", "v"),
        Measure("n_down", "count", "D"),
        Measure("rebound", "last", "U", "v")),
      navRefs = Seq(NavRef("__nav_first_d_v", first = true, "D", "v")))
    val rows = out.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toSeq.sortBy(r => (r._1, r._2))
    assert(rows === Seq((1, 1L, 8.0, 2L, 9.0), (3, 1L, 3.0, 1L, 4.0)))
  }

  test("nav RUNNING semantics: the candidate row counts as its own symbol") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // A AS v >= FIRST(A.v): at a run's first row FIRST(A.v) is the row
    // ITSELF (current row included, classified A) — v >= v holds, so
    // runs restart wherever the floor breaks. 5,3,4,6,2 →
    // [5], [3,4,6], [2]
    val df = Seq((1, 1, 5.0), (1, 2, 3.0), (1, 3, 4.0), (1, 4, 6.0), (1, 5, 2.0))
      .toDF("k", "seq", "v")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("A" -> (col("v") >= col("__nav_first_a_v"))),
      pattern = "A+",
      measures = Seq(
        Measure("floor", "first", "A", "v"),
        Measure("n", "count", "A")),
      navRefs = Seq(NavRef("__nav_first_a_v", first = true, "A", "v")))
    val rows = out.collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq.sortBy(_._1)
    assert(rows === Seq((1L, 5.0, 1L), (2L, 3.0, 3L), (3L, 2.0, 1L)))
  }

  test("nav over an unclassified symbol is NULL → predicate false (SQL 3VL)") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // pattern is just B; D never classifies a row, so FIRST(D.v) is
    // NULL and B's predicate is never true — zero matches, no errors
    val df = Seq((1, 1, 5.0), (1, 2, 9.0)).toDF("k", "seq", "v")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq(
        "D" -> (col("v") < 0),
        "B" -> (col("v") > col("__nav_first_d_v"))),
      pattern = "B",
      measures = Seq(Measure("n", "count", "*")),
      navRefs = Seq(NavRef("__nav_first_d_v", first = true, "D", "v")))
    assert(out.count() === 0L)
  }

  test("LAST nav reads the latest classified row, not the first") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // U AS v > LAST(D.v): recover above the BOTTOM (last declining
    // row), a weaker bar than FIRST. 10,9,3,4: from row 1, D+ = (9,3),
    // LAST(D.v)=3 < 4 → matches where the FIRST variant (above) had to
    // restart at row 2
    val df = Seq((3, 1, 10.0), (3, 2, 9.0), (3, 3, 3.0), (3, 4, 4.0))
      .toDF("k", "seq", "v")
      .withColumn("delta", col("v") - lag(col("v"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")))
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq(
        "D" -> (col("delta") < 0),
        "U" -> (col("v") > col("__nav_last_d_v"))),
      pattern = "D+ U",
      measures = Seq(
        Measure("n_down", "count", "D"),
        Measure("bottom", "last", "D", "v")),
      navRefs = Seq(NavRef("__nav_last_d_v", first = false, "D", "v")))
    val rows = out.collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows === Seq((3, 2L, 3.0)))
  }

  test("nav matches agree with a brute-force reference on 300 random value streams") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // For PATTERN (D+ U), D AS delta<0, U AS v > FIRST(D.v), SKIP PAST
    // LAST ROW, the match set has a closed form: per maximal declining
    // run [s..e] with a successor row e+1, the match starts at the
    // smallest p in [s..e] with v(e+1) > v(p) (v decreases over the
    // run, so the condition is monotone in p) and consumes [p, e+1].
    // all 300 streams ride ONE DataFrame as distinct keys — a single
    // matchPattern job exercises the compiled-predicate path per group
    val rnd = new scala.util.Random(42)
    val streams = (0 until 300).map { caseNo =>
      val n = 2 + rnd.nextInt(14)
      caseNo -> Array.fill(n)(rnd.nextInt(8).toDouble)
    }
    val want = streams.flatMap { case (k, v) =>
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      var i = 1
      while (i < v.length) {
        if (v(i) < v(i - 1)) {
          var e = i
          while (e + 1 < v.length && v(e + 1) < v(e)) e += 1
          if (e + 1 < v.length) {
            val p = (i to e).find(p0 => v(e + 1) > v(p0))
            p.foreach(p0 => out += ((k, p0, e + 2)))
          }
          i = e + 2
        } else i += 1
      }
      out
    }.sorted
    val df = streams.flatMap { case (k, v) =>
      v.zipWithIndex.map { case (x, j) => (k, j, x) }
    }.toDF("k", "seq", "v")
      .withColumn("delta", col("v") - lag(col("v"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")))
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq(
        "D" -> (col("delta") < 0),
        "U" -> (col("v") > col("__f"))),
      pattern = "D+ U",
      measures = Seq(
        Measure("s", "first", "D", "seq"),
        Measure("e", "last", "U", "seq")),
      navRefs = Seq(NavRef("__f", first = true, "D", "v")))
    val got = out.collect().map(r => (r.getInt(0), r.getInt(2), r.getInt(3) + 1))
      .toSeq.sorted
    assert(got === want, {
      val bad = got.diff(want) ++ want.diff(got)
      val badKeys = bad.map(_._1).distinct
      badKeys.map(k => s"k=$k v=${streams(k)._2.mkString(",")}").mkString("; ")
    })
  }

  test("keepEmpty matches agree with java.util.regex empty-match semantics on 300 random cases") {
    // Matcher.find() WITH empty matches kept is exactly keepEmpty:
    // an empty regex match at p is reported and the scan resumes at
    // p+1 — the SQL:2016 SHOW EMPTY MATCHES rule. Cross-check spans
    // (empty matches as (p, p)) on random (rows, pattern) cases.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val symGen = Gen.oneOf("A", "B", "C")
    val atomGen: Gen[String] = for {
      s <- symGen
      q <- Gen.oneOf("", "*", "?", "+", "{0,2}")
    } yield s + q
    val patGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 3)
      atoms <- Gen.listOfN(n, atomGen)
    } yield atoms.mkString(" ")
    val rowsGen = for {
      len <- Gen.chooseNum(0, 16)
      s <- Gen.listOfN(len, Gen.oneOf('A', 'B', 'C', 'X'))
    } yield s.mkString
    for (i <- 0 until 300) {
      val pat = patGen.pureApply(Gen.Parameters.default, Seed(7000L + i))
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(9000L + i))
      val got = findMatches(truthOf(rows, "ABCX"),
        parse(pat, "ABCX".map(_.toString)), keepEmpty = true)
        .map(m => (m.start, m.end))
      val mt = java.util.regex.Pattern.compile(pat.replace(" ", "")).matcher(rows)
      val want = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var from = 0
      while (from <= rows.length && mt.find(from)) {
        want += ((mt.start, mt.end))
        from = if (mt.end > mt.start) mt.end else mt.start + 1
      }
      // Java reports an empty match AT rows.length (end-of-input); our
      // matcher's starts are rows only — drop that one boundary case
      val wantTrimmed = want.filter(_._1 < rows.length)
      assert(got === wantTrimmed.toSeq, s"case $i: rows='$rows' pattern='$pat'")
    }
  }

  test("exclusions never change the match SET, only ALL ROWS output (property)") {
    // wrapping any sub-atom in {- -} must leave spans and classifiers
    // identical — exclusion is output suppression, not semantics
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowsGen = for {
      len <- Gen.chooseNum(0, 16)
      s <- Gen.listOfN(len, Gen.oneOf('A', 'B', 'X'))
    } yield s.mkString
    for (i <- 0 until 200) {
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(11000L + i))
      def run(p: String) = findMatches(truthOf(rows, "ABX"),
        parse(p, "ABX".map(_.toString)))
        .map(m => (m.start, m.end, m.cls.toSeq))
      assert(run("A {- B+ -} A?") === run("A B+ A?"), s"case $i rows='$rows'")
      assert(run("{- A -} B*") === run("A B*"), s"case $i rows='$rows'")
      // exclusion INSIDE a quantified group: per-iteration marks must
      // save/restore cleanly under rep backtracking
      assert(run("({- B -})+ A?") === run("(B)+ A?"), s"case $i rows='$rows'")
    }
  }

  test("PERMUTE expands to a lexicographic-preference alternation (round 10)") {
    // any order of the elements matches; preference follows the listed
    // order (A B C tried before A C B ...): on an ambiguous row string
    // the first listed permutation that fits wins the classification
    assert(spans("ABC", "ABC", "PERMUTE(A, B, C)") === Seq((0, 3)))
    assert(spans("CAB", "ABC", "PERMUTE(A, B, C)") === Seq((0, 3)))
    assert(spans("BCA", "ABC", "PERMUTE(A, B, C)") === Seq((0, 3)))
    assert(spans("ABBA", "AB", "PERMUTE(A, B)") === Seq((0, 2), (2, 4)))
    // elements may be composite
    assert(spans("BBAC", "ABC", "PERMUTE(A, B B) C") === Seq((0, 4)))
    // preference: with overlapping predicates the FIRST listed
    // permutation classifies (X rows satisfy both A and B)
    val truth = Array(Array(true, true), Array(true, true))
    val ms = findMatches(truth, parse("PERMUTE(A, B)", Seq("A", "B")))
    assert(ms.map(m => m.cls.toSeq) === Seq(Seq(0, 1))) // A then B, not B then A
    // cap is loud
    val e = intercept[Exception](parse("PERMUTE(A, A, A, A, A, A, A)", Seq("A")))
    assert(e.getMessage.contains("PERMUTE"))
  }

  test("SKIP TO FIRST/LAST accepts symbol unions (SUBSET resume points)") {
    import graft.operators.PatternMatch.parseSkip
    val truth = truthOf("ABAB", "AB")
    val pat = parse("A B", Seq("A", "B"))
    val single = findMatches(truth, pat, parseSkip("to first B", Seq("A", "B")))
    assert(single.map(m => (m.start, m.end)) === Seq((0, 2), (2, 4)))
    // FIRST over the union A|B is the match's own first row — the
    // SQL:2016 infinite-loop runtime error, loudly
    val e = intercept[Exception](findMatches(truth, pat,
      parseSkip("to first A|B", Seq("A", "B"))))
    assert(e.getMessage.contains("first row"))
    // LAST over the union resumes at the B row (row 2 starts the next
    // match); LAST over A alone is again the match's first row -> error
    val lastU = findMatches(truth, pat, parseSkip("to last A|B", Seq("A", "B")))
    assert(lastU.map(m => (m.start, m.end)) === Seq((0, 2), (2, 4)))
    val e2 = intercept[Exception](findMatches(truth, pat,
      parseSkip("to last A", Seq("A", "B"))))
    assert(e2.getMessage.contains("first row"))
  }

  test("SHOW EMPTY MATCHES: empty matches number and emit; OMIT drops them") {
    import spark.implicits._
    // B* over X B X: empty match at row 0, real match at row 1, empty
    // at row 2 — three match numbers; OMIT keeps only the real one
    val df = Seq((1, 1, "x"), (1, 2, "b"), (1, 3, "x")).toDF("k", "seq", "t")
    def run(empty: String, unmatched: Boolean) =
      PatternMatch.matchPatternAllRows(df,
        partitionBy = Seq("k"), orderBy = Seq("seq"),
        symbols = Seq("B" -> (col("t") === "b")), pattern = "B*",
        measures = Seq(Measure("n", "count", "*")),
        emptyMatches = empty, unmatchedRows = unmatched)
          .collect().map(r => (r.getInt(1), Option(r.get(2)).map(_.toString),
            Option(r.getAs[String]("classifier")), r.getLong(4))).toSeq
            .sortBy(_._1)
    val shown = run("show", false)
    assert(shown === Seq(
      (1, Some("1"), None, 0L),        // empty match at seq 1
      (2, Some("2"), Some("B"), 1L),   // real match
      (3, Some("3"), None, 0L)),       // empty match at seq 3
      shown)
    val omitted = run("omit", false)
    assert(omitted === Seq((2, Some("1"), Some("B"), 1L)), omitted)
  }

  test("WITH UNMATCHED ROWS emits non-matching rows with null match_num and measures") {
    import spark.implicits._
    // pattern B (non-nullable): row 2 matches; rows 1 and 3 unmatched
    val df = Seq((1, 1, "x"), (1, 2, "b"), (1, 3, "x")).toDF("k", "seq", "t")
    val out = PatternMatch.matchPatternAllRows(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("B" -> (col("t") === "b")), pattern = "B",
      measures = Seq(Measure("n", "count", "*")),
      unmatchedRows = true)
      .collect().map(r => (r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        Option(r.getAs[String]("classifier")),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq.sortBy(_._1)
    assert(out === Seq(
      (1, -1L, None, -1L),            // unmatched: everything null
      (2, 1L, Some("B"), 1L),
      (3, -1L, None, -1L)), out)
    // and an all-optional pattern under WITH UNMATCHED shows empty
    // matches too (the standard: unmatched mode implies show-empty)
    val out2 = PatternMatch.matchPatternAllRows(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("B" -> (col("t") === "b")), pattern = "B*",
      measures = Nil, unmatchedRows = true)
      .collect().map(r => (r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sortBy(_._1)
    assert(out2 === Seq((1, 1L), (2, 2L), (3, 3L)), out2) // no unmatched rows left
  }

  test("NULLS FIRST/LAST order specs move null rows to the chosen end of the stream") {
    import spark.implicits._
    import graft.operators.PatternMatch.orderSpec
    assert(orderSpec(Seq("ts", "ts ASC", "ts DESC", "ts NULLS LAST",
      "ts DESC NULLS FIRST")) === Seq(
      ("ts", true, true), ("ts", true, true), ("ts", false, false),
      ("ts", true, false), ("ts", false, true)))
    // a null-seq row at the END under NULLS LAST: pattern B A with the
    // null row (marked 'a') trailing matches; under the default
    // (ASC = NULLS FIRST) the null row LEADS and A B would match
    val df = Seq((1, Option(1), "b"), (1, Option.empty[Int], "a"))
      .toDF("k", "seq", "t")
    val syms = Seq("A" -> (col("t") === "a"), "B" -> (col("t") === "b"))
    val last = PatternMatch.matchPattern(df, Seq("k"), Seq("seq NULLS LAST"),
      syms, "B A", Seq(Measure("n", "count", "*"))).collect()
    assert(last.length == 1 && last(0).getLong(2) == 2L, last.mkString(";"))
    val first = PatternMatch.matchPattern(df, Seq("k"), Seq("seq"),
      syms, "A B", Seq(Measure("n", "count", "*"))).collect()
    assert(first.length == 1 && first(0).getLong(2) == 2L, first.mkString(";"))
  }

  test("anchors ^ and $ admit matches only at the partition edges (round 10)") {
    assert(spans("AA", "A", "^ A") === Seq((0, 1)))
    assert(spans("AA", "A", "A $") === Seq((1, 2)))
    assert(spans("AA", "A", "^ A+ $") === Seq((0, 2)))
    assert(spans("XA", "AX", "^ A") === Seq())
    // anchors consume nothing: ^ alone can only match empty -> no rows
    assert(spans("AA", "A", "^") === Seq())
  }

  test("exclusions {- -}: rows match and measure but are suppressed from ALL ROWS output") {
    import spark.implicits._
    val df = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"))
      .toDF("k", "seq", "t")
    val syms = Seq("A" -> (col("t") === "a"), "B" -> (col("t") === "b"),
      "C" -> (col("t") === "c"))
    val out = PatternMatch.matchPatternAllRows(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = syms, pattern = "A {- B+ -} C",
      measures = Seq(Measure("n_fin", "count", "*"),
        Measure("n_run", "count", "*", running = true),
        Measure("nb", "count", "B")))
      .collect().map(r => (r.getInt(1), r.getAs[String]("classifier"),
        r.getAs[Long]("n_fin"), r.getAs[Long]("n_run"), r.getAs[Long]("nb")))
      .toSeq.sortBy(_._1)
    // only A and C rows emit; measures COUNT the excluded B rows (FINAL
    // 4 everywhere, RUNNING 4 at the C row because B rows fed it)
    assert(out === Seq((1, "A", 4L, 1L, 2L), (4, "C", 4L, 4L, 2L)), out)
    // ONE ROW is untouched by exclusions
    val one = PatternMatch.matchPattern(df, Seq("k"), Seq("seq"), syms,
      "A {- B+ -} C", Seq(Measure("nb", "count", "B"))).collect()
    assert(one.length == 1 && one(0).getLong(2) == 2L, one.mkString(";"))
    // WITH UNMATCHED ROWS + exclusions is the SQL:2016 prohibition
    val e = intercept[Exception](PatternMatch.matchPatternAllRows(df,
      Seq("k"), Seq("seq"), syms, "A {- B+ -} C", Nil, unmatchedRows = true))
    assert(e.getMessage.contains("exclusion"), e.getMessage)
  }

  test("ONE ROW PER MATCH summarizes empty matches (SQL:2016 — no OMIT option there)") {
    import spark.implicits._
    // B* over x b x: empty match at row 1, real match at row 2, empty
    // at row 3 — three summary rows, empty ones COUNT 0 / null agg
    val df = Seq((1, 1, "x", 5.0), (1, 2, "b", 7.0), (1, 3, "x", 9.0))
      .toDF("k", "seq", "t", "v")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq("B" -> (col("t") === "b")), pattern = "B*",
      measures = Seq(Measure("n", "count", "*"), Measure("s", "sum", "B", "v")))
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq.sortBy(_._1)
    assert(out === Seq((1L, 0L, -1.0), (2L, 1L, 7.0), (3L, 0L, -1.0)), out)
  }

  test("q29 entry matches its oracle shape at sf0.001") {
    val q = SparkEntry.queries("q29_match_recognize")(spark, sf())
    assert(q.columns.toSeq === Seq("user_id", "match_num", "start_ts", "end_ts",
      "n_down", "n_up", "bottom", "peak"))
    assert(q.count() > 0)
  }

  // ---- CLASSIFIER()/MATCH_NUMBER() inside DEFINE (round 11) -----------

  test("PREV(CLASSIFIER()) + MATCH_NUMBER() in DEFINE: pair funnel, capped (round 11)") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // PATTERN (A B+), A = drop, B = PREV(CLASSIFIER())='A' AND mn<=3:
    // B+ collapses to one row (second B sees 'B'), matches are
    // (drop, successor) pairs eaten left to right, first three only.
    // v = 10,8,7,9,6,5,4,3,2,1 → drop runs rn[2,3], rn[5..10];
    // matches (2,3), (5,6), (7,8); the (9,10) attempt sees mn=4 → out.
    val df = Seq(10.0, 8.0, 7.0, 9.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.0)
      .zipWithIndex.map { case (v, i) => (1, i + 1, v) }.toDF("k", "seq", "v")
      .withColumn("delta", col("v") - lag(col("v"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")))
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq(
        "A" -> (col("delta") < 0),
        "B" -> (col("__pc") === "A" && col("__mn") <= 3)),
      pattern = "A B+",
      measures = Seq(
        Measure("drop_v", "last", "A", "v"),
        Measure("next_v", "last", "B", "v")),
      navRefs = Seq(
        NavRef("__pc", first = false, "*", "", occ = 1, kind = "clsprev"),
        NavRef("__mn", first = false, "*", "", kind = "matchnum")))
    val rows = out.collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq.sortBy(_._1)
    assert(rows === Seq((1L, 8.0, 7.0), (2L, 6.0, 5.0), (3L, 4.0, 3.0)), rows)
  }

  test("FIRST(CLASSIFIER()) in DEFINE reads the match's first label (round 11)") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // C admits only when the match STARTED on an A row: k=1 (-1,5,12)
    // matches; k=2 (3,5,12) never does (FIRST(CLASSIFIER())='B').
    val df = Seq((1, 1, -1.0), (1, 2, 5.0), (1, 3, 12.0),
      (2, 1, 3.0), (2, 2, 5.0), (2, 3, 12.0)).toDF("k", "seq", "v")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq(
        "A" -> (col("v") < 0),
        "B" -> (col("v") >= 0 && col("v") < 10),
        "C" -> (col("__fc") === "A" && col("v") >= 10)),
      pattern = "(A|B)+ C",
      measures = Seq(Measure("n", "count", "*")),
      navRefs = Seq(NavRef("__fc", first = true, "*", "", kind = "cls")))
    val rows = out.collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(rows === Seq((1, 3L)), rows.mkString(","))
  }

  test("PREV(CLASSIFIER()) is NULL before the match start (round 11)") {
    import spark.implicits._
    import graft.operators.PatternMatch.NavRef
    // B at the match's FIRST row reads PREV(CLASSIFIER()) = NULL (the
    // predecessor is outside the match) → 3VL false; only a B preceded
    // in-match by A admits. Pattern (A? B): row 1 alone can't match B
    // (no in-match predecessor), rows (1,2) match as (A, B).
    val df = Seq((1, 1, 1.0), (1, 2, 2.0)).toDF("k", "seq", "v")
    val out = PatternMatch.matchPattern(df,
      partitionBy = Seq("k"), orderBy = Seq("seq"),
      symbols = Seq(
        "A" -> lit(true),
        "B" -> (col("__pc") === "A")),
      pattern = "A? B",
      measures = Seq(Measure("n", "count", "*"),
        Measure("bv", "last", "B", "v")),
      navRefs = Seq(NavRef("__pc", first = false, "*", "", occ = 1, kind = "clsprev")))
    val rows = out.collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows === Seq((1L, 2L, 2.0)), rows.mkString(","))
  }

  test("q38 SQL semantics agree with a brute-force reference on 300 random streams") {
    import spark.implicits._
    // End-to-end through the MATCH_RECOGNIZE rewrite + TVF: the q38
    // funnel (A = drop, B = PREV(CLASSIFIER())='A' AND mn<=3) has a
    // one-pass closed form — eat (drop, successor) pairs left to
    // right, stop after three.
    val rnd = new scala.util.Random(1138)
    val streams = (0 until 300).map { caseNo =>
      val n = 2 + rnd.nextInt(14)
      caseNo -> Array.fill(n)(rnd.nextInt(6).toDouble)
    }
    val want = streams.flatMap { case (k, v) =>
      val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Int, Int)]()
      var i = 1
      while (i < v.length - 1 && out.length < 3) {
        if (v(i) < v(i - 1)) { // drop with a successor row: a match
          out += ((k, out.length + 1L, i, i + 1))
          i += 2
        } else i += 1
      }
      out
    }.sorted
    streams.flatMap { case (k, v) =>
      v.zipWithIndex.map { case (x, j) => (k, j, x) }
    }.toDF("k", "seq", "v").createOrReplaceTempView("mr_q38_rand")
    val got = spark.sql("""
      SELECT * FROM mr_q38_rand MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seq
        MEASURES A.seq AS a_seq, B.seq AS b_seq
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+)
        DEFINE A AS A.v < PREV(A.v),
               B AS PREV(CLASSIFIER()) = 'A' AND MATCH_NUMBER() <= 3
      )""").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq.sorted
    assert(got === want, {
      val bad = (got.diff(want) ++ want.diff(got)).map(_._1).distinct
      bad.map(k => s"k=$k v=${streams(k)._2.mkString(",")}").mkString("; ")
    })
  }
}
