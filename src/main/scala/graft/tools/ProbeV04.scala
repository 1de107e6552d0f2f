package graft.tools

/** r14 v04 stage attribution (guide §1.1): time each pipeline prefix
  * of the banded-LSH ANN path with the noop sink. At sf0.1 the corpus
  * is 2000 vectors, so the interesting question is how much of v04's
  * ~2.5 s bench time is plan/stage overhead (exchange count, AQE
  * rounds) vs compute.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProbeV04
  */
object ProbeV04 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.engine.GraftSession.create()
    graft.functions.GraftFunctions.register(s)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      noop(f)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-10s ${ts.min}%.3f s")
    }
    val n = graft.Tables(s, sfDir, "embeddings").count()
    val (np, bb) = graft.operators.VectorOps.geometryFor(n)
    time("sigv", graft.operators.VectorOps.probeSigv(s, sfDir, np, bb))
    time("cand", graft.operators.VectorOps.probeCand(s, sfDir, np, bb))
    time("pre", graft.operators.VectorOps.probePre(s, sfDir, np, bb, 0.35))
    time("full", graft.operators.VectorOps.annPairs(s, sfDir, np, bb, 0.35))
    s.stop()
  }
}
