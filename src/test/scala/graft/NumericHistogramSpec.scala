package graft

import org.apache.spark.sql.functions._

/** Ben-Haim/Tom-Tov streaming histogram (round 12,
  * functions/NumericHistogram.scala): exactness below bucket
  * saturation (the f25 oracle contract) and the paper's invariants
  * above it — exact total count, weighted-sum preservation, strictly
  * increasing centroids — plus rollup equality and the weighted form.
  */
class NumericHistogramSpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("below saturation the histogram is the exact value->count map, across 8 partials") {
    val s = registered
    import s.implicits._
    val rows = (1 to 4000).map(i => (i % 40 + 1).toDouble)
    rows.toDF("v").repartition(8).createOrReplaceTempView("nh_in")
    val m = s.sql("SELECT numeric_histogram(64, v) AS m FROM nh_in")
      .head().getAs[Map[Double, Double]]("m")
    val expect = rows.groupBy(identity).map { case (k, vs) => k -> vs.size.toDouble }
    assert(m == expect)
  }

  test("saturated regime: exact total, preserved weighted sum, increasing centroids") {
    val s = registered
    import s.implicits._
    val n = 20000
    val vals = (1 to n).map(i => (i * 2654435761L % 100000).toDouble)
    vals.toDF("v").repartition(8).createOrReplaceTempView("nh_sat")
    val r = s.sql("""
      SELECT map_keys(nh) AS ks, map_values(nh) AS vs FROM
        (SELECT numeric_histogram(32, v) AS nh FROM nh_sat)""").head()
    val ks = r.getAs[scala.collection.Seq[Double]]("ks").toSeq
    val ws = r.getAs[scala.collection.Seq[Double]]("vs").toSeq
    assert(ks.size == 32)
    assert(ks == ks.sorted && ks.distinct == ks, "centroids strictly increasing")
    assert(math.abs(ws.sum - n) < 1e-6, s"total count must be exact, got ${ws.sum}")
    val sketchSum = ks.zip(ws).map { case (c, w) => c * w }.sum
    val trueSum = vals.sum
    assert(math.abs(sketchSum - trueSum) / trueSum < 1e-9,
      "merges preserve the weighted sum to float rounding")
  }

  test("weighted form folds the weight into the count") {
    val s = registered
    import s.implicits._
    Seq((1.0, 3.0), (2.0, 5.0), (1.0, 2.0)).toDF("v", "w")
      .createOrReplaceTempView("nh_w")
    val m = s.sql("SELECT numeric_histogram(8, v, w) AS m FROM nh_w")
      .head().getAs[Map[Double, Double]]("m")
    assert(m == Map(1.0 -> 5.0, 2.0 -> 5.0))
  }

  test("NULL values and NULL weights contribute nothing") {
    val s = registered
    import s.implicits._
    Seq((Some(1.0), Some(1.0)), (None, Some(1.0)), (Some(2.0), None))
      .toDF("v", "w").createOrReplaceTempView("nh_null")
    val m = s.sql("SELECT numeric_histogram(8, v, w) AS m FROM nh_null")
      .head().getAs[Map[Double, Double]]("m")
    assert(m == Map(1.0 -> 1.0))
  }
}
