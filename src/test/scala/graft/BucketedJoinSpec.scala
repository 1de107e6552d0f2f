package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB fact-fact join technique the
  * LSH/similarity plans cannot use (their keys are dynamic): persist
  * both fact tables bucketed by the join key, and the join runs with
  * NO shuffle exchange on either side — each task zips matching
  * buckets. At 1000 executors this deletes the two largest exchanges
  * of the workload's hottest join.
  */
class BucketedJoinSpec extends SparkSpec {

  /** DROP + clear any stale managed-table location from a previous
    * JVM's run (the shared spark-warehouse survives test runs). */
  private def fresh(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (wh.exists) rm(wh)
  }

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val li = Tables(spark, sf(), "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(spark, sf(), "orders").select("o_orderkey", "o_totalprice")

    fresh("li_bucketed"); fresh("ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString

    // co-located: the join itself must see NO Exchange below it — the
    // only exchange allowed in the whole plan is the aggregation's
    // (and even that one is eliminated when grouping on the bucket key)
    val joinSection = p.substring(p.indexOf("Join"))
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${p.take(3000)}")
    // bucket pruning metadata is present on both scans
    assert("SelectedBucketsCount".r.findAllIn(p).size >= 2, p.take(3000))

    // correctness: same result as the unbucketed spelling
    val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    assert(joined.count() == want.count())
    assert(joined.exceptAll(want).isEmpty && want.exceptAll(joined).isEmpty)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }

  test("bucket filter prunes buckets on point lookups") {
    val li = Tables(spark, sf(), "lineitem").select("l_orderkey", "l_quantity")
    fresh("li_bucketed2")
    li.write.bucketBy(8, "l_orderkey").format("parquet").saveAsTable("li_bucketed2")
    // autoBucketedScan turns bucketed reading off for plans with no
    // join/agg on the bucket key; disable it so the point lookup can
    // use bucket pruning (the real knob an operator would set for
    // lookup-heavy workloads)
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("li_bucketed2").filter(col("l_orderkey") === 1L)
      val p = q.queryExecution.executedPlan.toString
      // a point predicate on the bucket column reads 1 of 8 buckets
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p.take(2000))
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed2")
    }
  }
}
