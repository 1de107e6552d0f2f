package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.store.GraftTable

/** Round-12 scale probes.
  *
  * spj:<nRows>:<nBuckets> — storage-partitioned join vs shuffled join
  * at nRows fact rows (dim = nRows/4): builds one bucketed and one
  * unbucketed copy of the same two tables in /tmp, joins each pair
  * through the DSv2 catalog with broadcast off, reports wall seconds
  * and the exchange count of each plan. The number that matters at
  * 100 TB is not the wall delta at probe scale (single node, page
  * cache) but the EXCHANGE count: 0 for SPJ means the network cost of
  * the join is O(0) at any scale, where the shuffled join moves both
  * tables across the cluster once.
  *
  * Usage: runMain graft.tools.Probe12 spj:5000000:32
  */
object Probe12 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach {
      case s if s.startsWith("spj:") =>
        val parts = s.split(':')
        spj(spark, parts(1).toLong, parts(2).toInt)
      case other => sys.error(s"unknown probe spec: $other")
    }
    spark.stop()
  }

  private def spj(spark: SparkSession, nRows: Long, nBuckets: Int): Unit = {
    val base = java.nio.file.Files.createTempDirectory("probe12").toString
    spark.conf.set("spark.sql.catalog.p12", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.p12.warehouse", base)
    spark.sql("CREATE NAMESPACE p12.db")

    val facts = spark.range(nRows).select(col("id"), (col("id") % 97 * 1.5).as("v"))
    val dims = spark.range(nRows / 4).select((col("id") * 4).as("id"),
      concat(lit("t"), (col("id") % 11).cast("string")).as("tag"))

    GraftTable.create(spark, s"$base/db/bf", facts, bucketBy = Some(("id", nBuckets)))
    GraftTable.create(spark, s"$base/db/bd", dims, bucketBy = Some(("id", nBuckets)))
    GraftTable.create(spark, s"$base/db/uf", facts)
    GraftTable.create(spark, s"$base/db/ud", dims)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def run(f: String, d: String): (Double, Int, Long) = {
      val q = spark.sql(
        s"SELECT SUM(x.v) AS s, COUNT(*) AS n FROM p12.db.$f x JOIN p12.db.$d y ON x.id = y.id")
      val t0 = System.nanoTime()
      val n = q.collect().head.getLong(1)
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = q.queryExecution.executedPlan.toString
      (sec, "Exchange hashpartitioning".r.findAllIn(plan).size, n)
    }
    // warm both paths once, then measure
    run("bf", "bd"); run("uf", "ud")
    val (bSec, bEx, bN) = run("bf", "bd")
    val (uSec, uEx, uN) = run("uf", "ud")
    require(bN == uN, s"row-count mismatch: $bN vs $uN")
    println(f"""{"probe":"spj","rows":$nRows,"buckets":$nBuckets,"matched":$bN,""" +
      f""""bucketed_sec":$bSec%.2f,"bucketed_exchanges":$bEx,""" +
      f""""shuffled_sec":$uSec%.2f,"shuffled_exchanges":$uEx}""")
  }
}
