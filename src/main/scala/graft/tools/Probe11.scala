package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession

/** Round-11 scale probes (r10 verdict #3) — one process, sequential
  * specs, one JSON line each with pre-run loadavg (the Probe8/9/10
  * A/B discipline).
  *
  *  - `sndic:<dir>:<nTriggers>:<compactEvery>` — per-batch probe cost
  *    of [[graft.streaming.EventStream.nearDupDocsIndexed]] across
  *    many triggers, with or without the round-11 index-maintenance
  *    cadence. The corpus's documents split into `nTriggers` one-file
  *    chunks streamed at maxFilesPerTrigger=1; per-trigger walls come
  *    from the query's own progress events (triggerExecution). With
  *    `compactEvery = 0` (the r10 shape) the index accretes one file
  *    per trigger and the per-batch probe pays one task + parquet
  *    footer per HISTORICAL trigger — wall grows with batch number on
  *    top of index size. With the cadence on, the small-file sweep
  *    bounds live file count, so late batches pay ~the same scan
  *    overhead as early ones. Reported: first/last-10-batch mean
  *    wall, the late/early ratio, end-state index file and commit
  *    counts, total wall, docs/s.
  *
  * Usage: runMain graft.tools.Probe11 <spec> [<spec> ...]
  */
object Probe11 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe11 sndic:<dir>:<nTriggers>:<compactEvery> ...")
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
      val json = parts(0) match {
        case "sndic" =>
          val dir = parts(1)
          val nTriggers = parts(2).toInt
          val compactEvery = parts(3).toInt
          val tmp = java.nio.file.Files.createTempDirectory("sndic").toString
          // one parquet file per trigger: repartition the corpus so
          // maxFilesPerTrigger=1 yields exactly nTriggers batches
          spark.read.parquet(s"$dir/documents.parquet")
            .select("doc_id", "source", "text")
            .repartition(nTriggers)
            .write.parquet(s"$tmp/src")
          val stream = spark.readStream
            .schema(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("source",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("text",
                org.apache.spark.sql.types.StringType))))
            .option("maxFilesPerTrigger", 1)
            .parquet(s"$tmp/src")
          spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "512")
          val t0 = System.nanoTime()
          val q = graft.streaming.EventStream.nearDupDocsIndexed(
            stream, s"$tmp/index", s"$tmp/out", s"$tmp/ckpt",
            compactEvery = compactEvery)
          q.awaitTermination()
          val secs = (System.nanoTime() - t0) / 1e9
          val walls = q.recentProgress.toSeq
            .sortBy(_.batchId)
            .flatMap(p => Option(p.durationMs.get("triggerExecution"))
              .map(ms => (p.batchId, ms.toDouble / 1000)))
            .filter(_._2 > 0)
          def mean(xs: Seq[Double]): Double =
            if (xs.isEmpty) 0.0 else xs.sum / xs.length
          val early = mean(walls.take(10).map(_._2))
          val late = mean(walls.takeRight(10).map(_._2))
          val idxT = graft.store.GraftTable.load(spark, s"$tmp/index")
          val idxFiles = idxT.read().inputFiles.length
          val idxCommits = idxT.history.length
          val nDocs = graft.store.GraftTable.load(spark, s"$tmp/out").read().count()
          s"""{"probe":"sndic","dir":"$dir","triggers":${walls.length},""" +
            s""""compact_every":$compactEvery,"docs":$nDocs,""" +
            s""""early10_sec":${f3(early)},"late10_sec":${f3(late)},""" +
            s""""late_over_early":${f3(late / math.max(early, 1e-9))},""" +
            s""""index_files":$idxFiles,"index_commits":$idxCommits,""" +
            s""""sec":${f3(secs)},"docs_per_sec":${f3(nDocs / secs)},""" +
            s""""loadavg_before":$load}"""
        case other => sys.error(s"unknown probe spec '$other'")
      }
      // the ONE greppable result line per spec
      println(s"PROBE11> $json")
    }
    spark.stop()
  }
}
