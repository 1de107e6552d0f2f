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
    // record host load with the run: this shared host gets multi-minute
    // contention bursts (documented r5 adjudication — a bench captured
    // under load 10+ reads like a 2-20x regression). The PRE-run idle
    // loadavg is the clean external-contention signal; the post-run
    // value includes this bench's own local[32] executor threads and
    // only bounds it from above.
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0)
      catch { case _: Exception => "-1" }
    val loadBefore = loadavg()
    val spark = engine.GraftSession.create()
    val warm = Tables(spark, sfDir, "region").count()
    require(warm > 0)
    // Warm the OS page cache on the two fact tables too (r11 verdict
    // #7): the first alphabetical query (d01) sorts lineitem+orders, so
    // with a region-only warmup its driver-run time carried the cold
    // first-scan penalty of BOTH big tables — a 3x driver-vs-self swing
    // adjudicated as page-cache state, not a regression. A full single
    // count per fact table moves that cost out of every query's timing.
    Seq("lineitem", "orders").foreach(t => Tables(spark, sfDir, t).count())
    // Two passes, min per query: pass 1 pays JIT/codegen compilation
    // (multi-second outliers on a cold JVM), pass 2 measures the
    // steady-state latency a resident engine actually delivers.
    // a query that throws reports -1 (visible failure marker), never
    // its time-to-fail masquerading as a fast success
    // optional restriction (scale probes bench only the scale-law
    // entries — a full sweep at sf10 would spend most of its time on
    // queries whose scaling is already settled)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
          val t0 = System.nanoTime()
          // Execute the query's OWN physical plan (toRdd), not count():
          // count() lets Catalyst prune unreferenced result columns and
          // even aggregate expressions — t23's aggregated left joins,
          // t03's simhash projection, t10's regex scrub all collapsed
          // to near-scans and under-measured (caught by the round-8
          // probes, where the folded totals ran the real pipeline).
          // toRdd materializes every result row with every column —
          // the work a consumer writing the result actually pays.
          val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
                   catch { case _: Throwable => false }
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
    // any failed pass marks the query failed (-1): an intermittent
    // failure must be visible, not papered over by its lucky pass
    val (p1, p2) = (pass(), pass())
    val results = p1.zip(p2).map { case ((n, a), (_, b)) =>
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    // 1 ms precision: full-precision doubles tripled the JSON line's
    // size and the driver's stdout-tail capture truncated it two rounds
    // running ("parsed": null in BENCH_r06) — keep the ONE line compact
    // and LAST on stdout, and persist the same bytes to a file
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and
    // a comma-decimal host would write {"value":46,200,...} — invalid
    // JSON, the exact parse failure this artifact exists to prevent
    def f3(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qjson(keyOf: String => String): String = results
      .map { case (k, v) => "\"" + keyOf(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // total over successful queries only — summing -1 sentinels would
    // make a build that BREAKS queries score faster
    val total = results.map(_._2).filter(_ >= 0).sum
    def envelope(qs: String): String =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""loadavg_before":$loadBefore,"loadavg_after":${loadavg()}}"""
    // file: full query names, the auditable cross-round artifact. A
    // RESTRICTED run (SPARK_GRAFT_QUERIES) writes a scratch file
    // instead — a 2-entry iteration run must never clobber the
    // committed full self-bench (review r11: commit b44b3c6 did
    // exactly that; FreshnessCheck now also guards it at round close)
    // ... and so must a non-default core-count run (r14: the driver's
    // SPARK_GRAFT_CPUS=8 scaling run clobbered the working-tree
    // BENCH_SELF.json) — only an unrestricted default-core run is the
    // artifact-of-record.
    val nonDefaultCpus = sys.env.get("SPARK_GRAFT_CPUS").exists(_ != "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_OUT",
      if (only.isDefined || nonDefaultCpus) "BENCH_PARTIAL.json" else "BENCH_SELF.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (envelope(qjson(identity)) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // stdout: SHORT query keys (the unique q01/t22/v04 prefixes). The
    // driver's harvester keeps only the LAST 2000 chars of stdout and the
    // full-name line is ~2.3k + an sbt "[success]" trailer — its head
    // (including "metric") was cut every round ("parsed": null in
    // BENCH_r06/r07). Short keys bring the line to ~1k so the whole
    // object survives the tail window; full names live in the file above.
    println(envelope(qjson(_.takeWhile(_ != '_'))))
  }
}
