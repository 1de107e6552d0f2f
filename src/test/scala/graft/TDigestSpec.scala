package graft

import org.apache.spark.sql.functions._

/** t-digest double-percentile sketch + polymorphic merge() (round 12,
  * functions/TDigest.scala): pure-regime exactness (the f27 oracle
  * contract), the saturated error envelope, merge-vs-rescan equality
  * in the pure regime, cross-family merge() dispatch, and loud
  * contract failures.
  */
class TDigestSpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("pure regime: distinct values <= compression give exact discrete quantiles") {
    val s = registered
    import s.implicits._
    // 25 distinct values with skewed multiplicities, far under c=100
    val rows = (1 to 5000).map(i => ((i % 25) + 1) * 0.5)
    rows.toDF("v").repartition(8).createOrReplaceTempView("td_in")
    val r = s.sql("""
      SELECT value_at_quantile(td, 0.5) AS p50,
             value_at_quantile(td, 0.01) AS p01,
             value_at_quantile(td, 1.0) AS p100,
             trimmed_mean(td, 0.2, 0.8) AS tm
      FROM (SELECT tdigest_agg(v) AS td FROM td_in)""").head()
    val sorted = rows.sorted
    def nearestRank(q: Double): Double = sorted(math.ceil(q * sorted.length).toInt - 1)
    assert(r.getDouble(0) == nearestRank(0.5))
    assert(r.getDouble(1) == nearestRank(0.01))
    assert(r.getDouble(2) == sorted.last)
    val lo = 0.2 * sorted.length; val hi = 0.8 * sorted.length
    val window = sorted.zipWithIndex
      .filter { case (_, i) => (i + 1) > lo && (i + 1) <= math.floor(hi) }.map(_._1)
    assert(math.abs(r.getDouble(3) - window.sum / window.size) < 1e-12)
  }

  test("merge() rollup equals the single-scan digest in the pure regime") {
    val s = registered
    import s.implicits._
    val rows = (1 to 6000).map(i => (i % 6, ((i % 30) + 1) * 1.25))
    rows.toDF("g", "v").createOrReplaceTempView("td_merge")
    val direct = s.sql("SELECT tdigest_agg(v) AS td FROM td_merge")
      .head().getAs[Array[Byte]]("td")
    val rolled = s.sql("""SELECT merge(td) AS td FROM
      (SELECT g, tdigest_agg(v) AS td FROM td_merge GROUP BY g)""")
      .head().getAs[Array[Byte]]("td")
    assert(java.util.Arrays.equals(direct, rolled),
      "pure-regime rollup must equal the one-scan digest byte-for-byte")
  }

  test("saturated regime: quantiles within 2% rank error at 50k distinct, c=200") {
    val s = registered
    import s.implicits._
    val n = 50000
    (1 to n).map(_.toDouble).toDF("v").repartition(8)
      .createOrReplaceTempView("td_sat")
    val r = s.sql("""
      SELECT value_at_quantile(td, 0.5) AS p50,
             value_at_quantile(td, 0.99) AS p99,
             value_at_quantile(td, 0.001) AS p001
      FROM (SELECT tdigest_agg(v, 1, 200) AS td FROM td_sat)""").head()
    // rank error, not value error: values ARE ranks here
    assert(math.abs(r.getDouble(0) - 0.5 * n) / n < 0.02, s"p50 ${r.getDouble(0)}")
    // k1 scale concentrates accuracy at the tails
    assert(math.abs(r.getDouble(1) - 0.99 * n) / n < 0.005, s"p99 ${r.getDouble(1)}")
    assert(r.getDouble(2) / n < 0.005, s"p001 ${r.getDouble(2)}")
  }

  test("weights fold multiplicities; merge() rejects mixed families and foreign bytes") {
    val s = registered
    import s.implicits._
    val weighted = s.sql(
      "SELECT value_at_quantile(tdigest_agg(v, w), 0.5) AS p50 FROM " +
        "VALUES (1.0, 1.0), (2.0, 8.0), (3.0, 1.0) AS t(v, w)").head()
    assert(weighted.getDouble(0) == 2.0) // rank 5 of 10 sits in the w=8 block
    val e = intercept[Exception] {
      s.sql("""SELECT merge(sk) FROM (
        SELECT qdigest_agg(CAST(id AS BIGINT), 64) AS sk FROM range(10)
        UNION ALL
        SELECT tdigest_agg(CAST(id AS DOUBLE)) AS sk FROM range(10))""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("mix sketch families")), s"got ${msgs(e)}")
    val e2 = intercept[Exception] {
      Seq(Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9)).toDF("b")
        .selectExpr("value_at_quantile(b, 0.5)").collect()
    }
    assert(msgs(e2).exists(_.contains("not a tdigest")), s"got ${msgs(e2)}")
    // a ONE-row group must hit the same validation (r12 review: the
    // empty-buffer fast path used to pass garbage through unparsed)
    val e3 = intercept[Exception] {
      Seq(Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9)).toDF("b")
        .selectExpr("merge(b)").collect()
    }
    assert(msgs(e3).exists(_.contains("merge() expects")), s"got ${msgs(e3)}")
  }

  test("values_at_quantiles coerces non-double quantile arrays (r12 review)") {
    val s = registered
    import s.implicits._
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("td_qarr")
    // decimal literals (0.5) and an int-typed array must both coerce
    val r = s.sql("""
      SELECT values_at_quantiles(td, array(0.5, 0.9)) AS a,
             values_at_quantiles(td, array(1)) AS b
      FROM (SELECT tdigest_agg(v) AS td FROM td_qarr)""").head()
    assert(r.getAs[scala.collection.Seq[Double]]("a").toSeq == Seq(50.0, 90.0))
    assert(r.getAs[scala.collection.Seq[Double]]("b").toSeq == Seq(100.0))
  }

  test("merge() also unions qdigest and setdigest rows (Trino's generic merge)") {
    val s = registered
    import s.implicits._
    (1 to 1000).map(_.toLong).toDF("v").createOrReplaceTempView("gm_in")
    val q = s.sql("""SELECT qdigest_quantile(merge(sk), 0.5) AS p50 FROM
      (SELECT v % 4 AS g, qdigest_agg(v, 4096) AS sk FROM gm_in GROUP BY v % 4)""").head()
    assert(q.getLong(0) == 500L)
    val c = s.sql("""SELECT set_digest_cardinality(merge(sk)) AS d FROM
      (SELECT v % 4 AS g, make_set_digest(v, 2048) AS sk FROM gm_in GROUP BY v % 4)""").head()
    assert(c.getLong(0) == 1000L)
    // and DataSketches HLL rows from approx_set (Trino's fourth family)
    val h = s.sql("""SELECT CAST(hll_sketch_estimate(merge(sk)) AS BIGINT) AS d FROM
      (SELECT v % 4 AS g, approx_set(v) AS sk FROM gm_in GROUP BY v % 4)""").head()
    assert(math.abs(h.getLong(0) - 1000L) <= 20, s"hll est ${h.getLong(0)}")
  }
}
