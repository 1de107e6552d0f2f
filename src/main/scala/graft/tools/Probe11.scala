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
  *  - `soak:<sfdir>:<seconds>:<rate>` — service-rate parity soak
  *    (r10 verdict #7): drive serve.QueryService at the reference
  *    SQL Lab's async submission rate (100 tasks/s; 300 s result-cache
  *    TTL; 600 s limit) with mixed relational/dedup/MATCH_RECOGNIZE
  *    entries, 5% fresh-literal misses, 4 impersonated users.
  *    Reported: sustained q/s, max backlog, tail drain, cache hit
  *    rate, miss-latency p50/p99, heap before/after (flat = the
  *    round-11 terminal-status retention working).
  *
  *  - `kmv:<sfdir>:<k>[:<splitdate>]` — the f20 wager at scale: distinct-customer
  *    overlap between order-date halves via the KMV sketch pair (two
  *    scans, NO value shuffle — partial sketches merge) vs the exact
  *    spelling (two shuffled DISTINCTs + an intersect join). Reported:
  *    both walls, both answers, the sketch's relative error at this
  *    corpus (k-saturated ⇒ the 1/√k regime).
  *
  *  - `shards:<dir>:<nShards>` — [[graft.operators.TextOps
  *    .writeTrainingShards]] end-to-end at corpus scale: wall, docs/s,
  *    shard balance (max/min), files per shard dir.
  *
  * Usage: runMain graft.tools.Probe11 <spec> [<spec> ...]
  */
object Probe11 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Probe11 sndic:<dir>:<nTriggers>:<compactEvery> | soak:<dir>:<seconds>:<rate> ...")
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
        case "soak" =>
          // service-rate parity soak (r10 verdict #7): drive
          // serve.QueryService at the reference SQL Lab's async rate
          // (100 tasks/s, 300 s cache TTL, 600 s limit) for `seconds`
          // with mixed entries; report sustained q/s, backlog, cache
          // hit rate, Finished-latency percentiles, heap before/after.
          val dir = parts(1)
          val seconds = parts(2).toInt
          val rate = parts(3).toInt
          graft.Tables.registerAll(spark, dir)
          val svc = new graft.serve.QueryService(spark, workers = 8,
            cacheTtlSeconds = 300,
            onUserSession = (s, _) => graft.Tables.registerAll(s, dir))
          def heapMB(): Long = {
            System.gc(); Thread.sleep(200); System.gc()
            val r = Runtime.getRuntime
            (r.totalMemory() - r.freeMemory()) >> 20
          }
          val relational =
            "SELECT l_returnflag, SUM(l_quantity) AS q FROM lineitem GROUP BY l_returnflag"
          val dedup = "SELECT COUNT(*) AS n FROM (SELECT md5(text) AS h " +
            "FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1)"
          val pattern = """SELECT COUNT(*) AS n FROM (
            SELECT * FROM (SELECT user_id, ts, event_id, value FROM events
                           WHERE event_type = 'purchase') MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY ts, event_id
              MEASURES COUNT(D.*) AS nd ONE ROW PER MATCH
              PATTERN (D+ U)
              DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)))"""
          val repeats = Array(relational, dedup, pattern)
          repeats.foreach(svc.sql(_)) // warm the three plans
          val heap0 = heapMB()
          val t0 = System.nanoTime()
          val total = seconds * rate
          val ids = new Array[Long](total)
          var maxBacklog = 0
          var i = 0
          while (i < total) {
            val sql =
              if (i % 20 == 19)
                s"$relational HAVING SUM(l_quantity) > ${i % 7919}"
              else repeats(i % repeats.length)
            ids(i) = svc.submit(sql, user = s"u${i % 4}")
            if (i % 200 == 199) {
              val from = math.max(0, i - 2000)
              var backlog = 0
              var j = from
              while (j <= i) {
                val st = svc.status(ids(j))
                if (st.exists(s => s == svc.Queued || s == svc.Running)) backlog += 1
                j += 1
              }
              maxBacklog = math.max(maxBacklog, backlog)
            }
            val due = t0 + (i + 1) * (1000000000L / rate)
            val lag = due - System.nanoTime()
            if (lag > 0) Thread.sleep(lag / 1000000L, (lag % 1000000L).toInt)
            i += 1
          }
          val driveSecs = (System.nanoTime() - t0) / 1e9
          // drain the tail
          val tail = ids.takeRight(500)
          val tailOk = tail.map(svc.await(_, 60000)).count {
            case _: svc.Finished => true
            case _               => false
          }
          val finished = ids.takeRight(2000).flatMap(svc.status).collect {
            case f: svc.Finished => f
          }
          val hitRate =
            if (finished.isEmpty) 0.0
            else finished.count(_.fromCache).toDouble / finished.length
          val lats = finished.filterNot(_.fromCache).map(_.elapsedMs).sorted
          def pct(p: Double): Long =
            if (lats.isEmpty) -1 else lats(math.min(lats.length - 1,
              (p * lats.length).toInt))
          val heap1 = heapMB()
          svc.close()
          s"""{"probe":"soak","dir":"$dir","seconds":$seconds,"rate":$rate,""" +
            s""""submitted":$total,"sustained_per_s":${f3(total / driveSecs)},""" +
            s""""tail_finished":$tailOk,"max_backlog":$maxBacklog,""" +
            s""""cache_hit_rate":${f3(hitRate)},"miss_p50_ms":${pct(0.5)},""" +
            s""""miss_p99_ms":${pct(0.99)},"heap_mb_before":$heap0,""" +
            s""""heap_mb_after":$heap1,"loadavg_before":$load}"""
        case "kmv" =>
          val dir = parts(1)
          val k = parts(2).toInt
          // the split must straddle the corpus's date range (ScaleUp's
          // sf1 orders span 1995-2001; f20's sf0.01 spans 1992-1998)
          val split = if (parts.length > 3) parts(3) else "1995-01-01"
          graft.functions.GraftFunctions.register(spark)
          val orders = graft.Tables(spark, dir, "orders")
          orders.createOrReplaceTempView("kmv_orders")
          def timed[T](f: => T): (T, Double) = {
            val t0 = System.nanoTime(); val r = f
            (r, (System.nanoTime() - t0) / 1e9)
          }
          val (exact, exactSec) = timed {
            spark.sql(s"""SELECT COUNT(*) FROM (
                SELECT DISTINCT o_custkey FROM kmv_orders WHERE o_orderdate < DATE '$split'
                INTERSECT
                SELECT DISTINCT o_custkey FROM kmv_orders WHERE o_orderdate >= DATE '$split')""")
              .head().getLong(0)
          }
          val (est, kmvSec) = timed {
            spark.sql(s"""SELECT kmv_intersect_est(s1, s2) FROM (
                SELECT kmv_sketch(CASE WHEN o_orderdate < DATE '$split'
                         THEN o_custkey END, $k) AS s1,
                       kmv_sketch(CASE WHEN o_orderdate >= DATE '$split'
                         THEN o_custkey END, $k) AS s2
                FROM kmv_orders)""").head().getDouble(0)
          }
          val relErr = if (exact == 0) 0.0 else math.abs(est - exact) / exact
          s"""{"probe":"kmv","dir":"$dir","k":$k,"split":"$split","exact":$exact,""" +
            s""""est":${f3(est)},"rel_err":${f3(relErr)},""" +
            s""""exact_sec":${f3(exactSec)},"kmv_sec":${f3(kmvSec)},""" +
            s""""loadavg_before":$load}"""
        case "shards" =>
          val dir = parts(1)
          val nShards = parts(2).toInt
          val docs = graft.Tables(spark, dir, "documents")
          val nDocs = docs.count()
          val out = java.nio.file.Files.createTempDirectory("shards_probe").toString
          val t0 = System.nanoTime()
          graft.operators.TextOps.writeTrainingShards(docs, out, nShards, seed = 42)
          val secs = (System.nanoTime() - t0) / 1e9
          val dirs = new java.io.File(out).listFiles()
            .filter(_.getName.startsWith("shard="))
          val perShard = dirs.map(d =>
            d.listFiles().count(_.getName.endsWith(".parquet")))
          val counts = spark.read.parquet(out).groupBy("shard").count()
            .collect().map(_.getLong(1))
          s"""{"probe":"shards","dir":"$dir","n_shards":$nShards,"docs":$nDocs,""" +
            s""""sec":${f3(secs)},"docs_per_sec":${f3(nDocs / secs)},""" +
            s""""files_per_shard_max":${perShard.max},""" +
            s""""balance_max_over_min":${f3(counts.max.toDouble / counts.min)},""" +
            s""""loadavg_before":$load}"""
        case other => sys.error(s"unknown probe spec '$other'")
      }
      // the ONE greppable result line per spec
      println(s"PROBE11> $json")
    }
    spark.stop()
  }
}
