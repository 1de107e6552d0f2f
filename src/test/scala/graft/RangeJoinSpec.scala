package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Range-join semantics (inclusive containment, no dedup needed) and
  * the plan property that makes it scale: an equi-join on (key, grain),
  * never a nested-loop range join.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pts = Seq(
    ("u1", 5L, "a"), ("u1", 10L, "b"), ("u1", 25L, "c"), ("u1", 30L, "d"),
    ("u2", 10L, "e")
  ).toDF("k", "t", "tag")

  private lazy val ivs = Seq(
    ("u1", 10L, 25L, "w1"),   // matches b (inclusive lo) and c (inclusive hi)
    ("u1", 0L, 4L, "w2"),     // matches nothing (5 > 4)
    ("u1", 28L, 99L, "w3"),   // matches d
    ("u2", 50L, 40L, "w4"),   // empty interval (lo > hi) matches nothing
    ("u3", 0L, 99L, "w5")     // key absent on the left
  ).toDF("k", "lo", "hi", "w")

  test("inclusive containment, exactly-once matches, across grains") {
    // grain deliberately smaller than the intervals: every interval
    // explodes over several grains, and matches must still be unique
    for (grain <- Seq(1L, 7L, 100L)) {
      val out = RangeJoin.binnedIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi", grain)
        .select("w", "tag").as[(String, String)].collect().toSet
      assert(out == Set(("w1", "b"), ("w1", "c"), ("w3", "d")), s"grain=$grain")
    }
  }

  test("no duplicate rows even when an interval covers many grains") {
    val out = RangeJoin.binnedIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi", 2L)
    assert(out.count() == out.distinct().count())
  }

  test("plan is an equi-join on (key, grain), not a nested loop") {
    val plan = RangeJoin.binnedIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__grain"), plan)
  }

  test("binning stays exact beyond 2^53 (no float-division precision loss)") {
    // values where double arithmetic has ulp 256: a boundary point one
    // unit inside/outside the interval must bin exactly
    val base = (1L << 60) + 123456789L
    val bigPts = Seq(
      ("u1", base, "in_lo"), ("u1", base + 999L, "in_hi"),
      ("u1", base - 1L, "below"), ("u1", base + 1000L, "above")
    ).toDF("k", "t", "tag")
    val bigIvs = Seq(("u1", base, base + 999L, "w")).toDF("k", "lo", "hi", "w")
    for (grain <- Seq(1000L, 64L, 7L)) {
      val got = RangeJoin.binnedIntervalJoin(bigPts, bigIvs, Seq("k"), "t", "lo", "hi", grain)
        .select("tag").as[String].collect().toSet
      assert(got == Set("in_lo", "in_hi"), s"grain=$grain got=$got")
    }
  }

  test("wild intervals fail loudly instead of exploding the job") {
    val wild = Seq(("u1", 0L, Long.MaxValue / 2, "w")).toDF("k", "lo", "hi", "w")
    val e = intercept[Exception](
      RangeJoin.binnedIntervalJoin(pts, wild, Seq("k"), "t", "lo", "hi",
        grain = 10L, maxFanoutPerInterval = 1000L).count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxFanoutPerInterval")), msgs(e).mkString(" | "))
    // bounded intervals under the same cap pass untouched
    assert(RangeJoin.binnedIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi",
      grain = 10L, maxFanoutPerInterval = 1000L).count() == 3)
  }

  test("guards: bad grain, colliding columns") {
    intercept[IllegalArgumentException](
      RangeJoin.binnedIntervalJoin(pts, ivs, Seq("k"), "t", "lo", "hi", 0L))
    val bad = ivs.withColumnRenamed("w", "tag")
    val e = intercept[IllegalArgumentException](
      RangeJoin.binnedIntervalJoin(pts, bad, Seq("k"), "t", "lo", "hi", 10L))
    assert(e.getMessage.contains("tag"))
  }

  test("e08 entry sanity: purchases count themselves, windows bound matches") {
    val df = SparkEntry.queries("e08_interval_join")(spark, sf())
    // every purchase's window contains at least the purchase itself
    assert(df.filter(col("n_events") < 1).count() == 0)
    val purchases = Tables(spark, sf(), "events")
      .filter(col("event_type") === "purchase").count()
    assert(df.count() == purchases)
  }
}
