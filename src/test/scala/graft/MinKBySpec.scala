package graft

import org.apache.spark.sql.functions._

/** Trino min_by/max_by(x, y, n) as a bounded TypedImperativeAggregate
  * (round 11, functions/MinKBy.scala): window-spelling parity,
  * multiplicity of identical pairs, merge-order determinism, and the
  * loud rejections.
  */
class MinKBySpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("min_by(x, y, n) matches the ROW_NUMBER window spelling, in y order") {
    val s = registered
    Tables(s, sf(), "documents").createOrReplaceTempView("mkb_docs")
    val agg = s.sql("""
      SELECT source, pick FROM (
        SELECT source, min_by(doc_id, md5(CAST(doc_id AS STRING)), 4) AS picks
        FROM mkb_docs GROUP BY source)
      LATERAL VIEW posexplode(picks) AS rk, pick""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val win = s.sql("""
      SELECT source, doc_id FROM (
        SELECT source, doc_id,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS STRING))) AS rk
        FROM mkb_docs) WHERE rk <= 4""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(agg.nonEmpty && agg == win)
  }

  test("identical (y, x) pairs keep multiplicity; ties break by payload; order is y-ascending") {
    val s = registered
    val got = s.sql("""
      SELECT min_by(x, y, 4) FROM VALUES
        ('b', 1), ('b', 1), ('a', 1), ('z', 2), ('q', 9) AS t(x, y)""")
      .head().getSeq[String](0)
    // y=1 holds {a, b, b} (payload-ordered), then y=2's z
    assert(got == Seq("a", "b", "b", "z"), got)
    val mx = s.sql("""
      SELECT max_by(x, y, 3) FROM VALUES
        ('b', 1), ('b', 1), ('a', 1), ('z', 2), ('q', 9) AS t(x, y)""")
      .head().getSeq[String](0)
    // y descending: 9's q, 2's z, then ONE of y=1 (payload-reversed: b)
    assert(mx == Seq("q", "z", "b"), mx)
  }

  test("merge-order determinism: any partitioning yields the same arrays") {
    val s = registered
    import s.implicits._
    // heavy tie load: y has only 3 distinct values over 9k rows
    val df = (1 to 9000).map(i => (i.toLong, i % 3)).toDF("x", "y")
    def run(parts: Int) =
      df.repartition(parts).groupBy().agg(expr("min_by(x, y, 7)"))
        .head().getSeq[Long](0)
    val one = run(1)
    assert(one == run(13) && one == run(32), s"merge order changed the result")
    // and the content is right: seven smallest (y, x) pairs = y=0 rows
    // ordered by x: 3, 6, 9, ...
    assert(one == Seq(3L, 6L, 9L, 12L, 15L, 18L, 21L), one)
  }

  test("NULL ordering keys are skipped; NULL payloads are kept") {
    val s = registered
    val got = s.sql("""
      SELECT min_by(x, y, 3) FROM VALUES
        ('dead', CAST(NULL AS INT)), (CAST(NULL AS STRING), 1), ('b', 1), ('c', 2)
        AS t(x, y)""").head().getSeq[String](0)
    assert(got == Seq(null, "b", "c"), got)
  }

  test("2-arg min_by/max_by still resolve after registration (builtin passthrough)") {
    val s = registered
    val r = s.sql(
      "SELECT min_by(x, y), max_by(x, y) FROM VALUES ('lo', 1), ('hi', 9) AS t(x, y)").head()
    assert(r.getString(0) == "lo" && r.getString(1) == "hi")
  }

  test("unsupported types and bad n reject loudly") {
    val s = registered
    val e1 = intercept[Exception](s.sql(
      "SELECT min_by(named_struct('a', x), y, 2) FROM VALUES (1, 1) AS t(x, y)").collect())
    assert(e1.getMessage.contains("unsupported value type"), e1.getMessage)
    val e2 = intercept[Exception](s.sql(
      "SELECT min_by(x, y, 0) FROM VALUES (1, 1) AS t(x, y)").collect())
    assert(e2.getMessage.contains("[1, 1000000]"), e2.getMessage)
    val e3 = intercept[Exception](s.sql(
      "SELECT min_by(x, y, 1, 9) FROM VALUES (1, 1) AS t(x, y)").collect())
    assert(e3.getMessage.contains("min_by takes 2 to 3"), e3.getMessage)
  }
}
