package graft.tools

import graft.Tables
import graft.engine.GraftSession

/** Round-8 scale-law probes (r7 verdict #1): one-process A/B runs for
  * the two untested tiers of the dedup/ANN scale laws.
  *
  *  - `v04:<dir>:<threshold>` — banded-LSH ANN pairs at an explicit
  *    cosine threshold over `<dir>/embeddings.parquet` with the
  *    corpus-adaptive geometry. The design claim under test: at the
  *    near-dup threshold (>= 0.6) answers are SPARSE, so wall time
  *    tracks the N^1.5 candidate law, not the quadratic 0.35-demo
  *    answer set.
  *  - `t21:<dir>` — adaptive-geometry simhash near-dup pairs over
  *    `<dir>/documents.parquet`, reporting the chosen band count B.
  *    The claim under test: crossing the B=5 -> B=6 boundary (6.71M
  *    docs) keeps cost linear-ish (2x family fan-out) instead of the
  *    band-saturation blowup the fixed geometry had.
  *
  * All specs run sequentially in ONE process (JVM/codegen warm after
  * the first; the A/B discipline from the r6 loadavg-attribution
  * rule), each printing one JSON line with pre-run loadavg.
  *
  * Usage: runMain graft.tools.Probe8 <spec> [<spec> ...]
  */
object Probe8 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe8 v04:<dir>:<threshold>|t21:<dir> ...")
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0)
      catch { case _: Exception => "-1" }
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    args.foreach { spec =>
      val parts = spec.split(":")
      val load = loadavg()
      val t0 = System.nanoTime()
      val json = parts(0) match {
        case "v04" =>
          val (dir, th) = (parts(1), parts(2).toDouble)
          val n = Tables(spark, dir, "embeddings").count()
          val (np, bb) = graft.operators.VectorOps.geometryFor(n)
          val pairs = graft.operators.VectorOps
            .annPairs(spark, dir, np, bb, th).count()
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"v04","dir":"$dir","threshold":$th,"n":$n,""" +
            s""""planes":$np,"bits":$bb,"pairs":$pairs,"sec":${f3(secs)},""" +
            s""""loadavg_before":$load}"""
        case "t21" =>
          val dir = parts(1)
          val nd = Tables(spark, dir, "documents")
            .where("text IS NOT NULL AND trim(text) != ''").count()
          val b = graft.operators.TextOps.simhashBlocksFor(nd)
          val pairs = graft.operators.TextOps.simhashPairs(spark, dir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"t21","dir":"$dir","n":$nd,"blocks":$b,""" +
            s""""pairs":$pairs,"sec":${f3(secs)},"loadavg_before":$load}"""
        case "t23" =>
          // boilerplate detection: ONE action folding the per-doc
          // report to corpus totals (rows == docs, so a bare count
          // would measure nothing about the dup-gram volume)
          val dir = parts(1)
          val r = graft.SparkEntry.queries("t23_boilerplate")(spark, dir)
            .agg(org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("docs"),
              org.apache.spark.sql.functions.sum("n_dup_grams").as("dups"),
              org.apache.spark.sql.functions.sum("n_covered").as("cov"))
            .collect()(0)
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"t23","dir":"$dir","docs":${r.getLong(0)},""" +
            s""""dup_grams":${r.getLong(1)},"covered":${r.getLong(2)},""" +
            s""""sec":${f3(secs)},"loadavg_before":$load}"""
        case "t13" | "t24" =>
          // decontamination A/B: same overlap answer, broadcast-verify
          // (t13) vs bloom-prefilter + shuffled-verify (t24) — folded
          // to corpus totals so the work, not the row dump, is timed
          val dir = parts(1)
          val name = if (parts(0) == "t13") "t13_decontaminate"
                     else "t24_decontaminate_bloom"
          val r = graft.SparkEntry.queries(name)(spark, dir)
            .agg(org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("docs"),
              org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.sum("n_overlap"),
                org.apache.spark.sql.functions.lit(0L)).as("overlaps"))
            .collect()(0)
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"${parts(0)}","dir":"$dir","docs":${r.getLong(0)},""" +
            s""""overlaps":${r.getLong(1)},"sec":${f3(secs)},"loadavg_before":$load}"""
        case "v08" =>
          // semantic dedup: first invocation on a fresh dir pays the
          // index TRAIN (ensureIndex persists it) — the A/B discipline
          // runs each spec twice and reads the warm number
          val dir = parts(1)
          val r = graft.SparkEntry.queries("v08_semantic_dedup")(spark, dir)
            .agg(org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("dropped"),
              org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.sum("n_dom"),
                org.apache.spark.sql.functions.lit(0L)).as("pairs"))
            .collect()(0)
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"v08","dir":"$dir","dropped":${r.getLong(0)},""" +
            s""""pairs":${r.getLong(1)},"sec":${f3(secs)},"loadavg_before":$load}"""
        case other => sys.error(s"unknown probe '$other'")
      }
      println(json)
    }
    spark.stop()
  }
}
