package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.{TextOps, VectorOps}

/** Round-9 scale probes (r8 verdict "Next round" #2/#3/#4) — one
  * process, sequential specs, one JSON line each with pre-run loadavg
  * (the Probe8 A/B discipline).
  *
  *  - `dct:<dir>:<mod>:<regime>` — decontamination regime A/B for the
  *    t13/t24 crossover: eval = docs with `doc_id % mod == 0` (mod < 0
  *    INVERTS the split — eval = `% |mod| != 0`, the big-eval shape a
  *    real 50M-gram suite has), regime `broadcast` | `bloom`. Reports
  *    the distinct eval-gram count (the auto regime's decision input)
  *    and the operator wall INCLUDING its own eager actions.
  *  - `t21f:<dir>:<B>` — simhash near-dup pairs with the geometry
  *    FORCED to B blocks. The natural B=6→7 switch sits at N > 214.7M
  *    docs (`simhashBlocksFor`) — ~65 GB of corpus, past this probe
  *    VM's disk — so the forced A/B at the same corpus measures the
  *    term the ladder extrapolates: family fan-out C(B,3) growth at
  *    fixed N (20 → 35 families), with the answer geometry-invariant.
  *  - `v08a:<dir>` — v08's ASSIGNMENT stage alone (scored argmax over
  *    k broadcast centroids, the N·sqrt(N/5) term); `v08f:<dir>` — the
  *    full SemDeDup entry. Same process, warm: full − assignment
  *    attributes the pair join.
  *
  * Usage: runMain graft.tools.Probe9 <spec> [<spec> ...]
  */
object Probe9 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Probe9 dct:<dir>:<mod>:<regime>|t21f:<dir>:<B>|v08a:<dir>|v08f:<dir> ...")
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
        case "dct" =>
          val (dir, mod, regime) = (parts(1), parts(2).toInt, parts(3))
          val grams = TextOps.wordFiveGrams(spark, dir)
          val m = math.abs(mod)
          val evalPred =
            if (mod > 0) col("doc_id") % m === 0 else col("doc_id") % m =!= 0
          // decision input, measured OUTSIDE the timed window (the
          // operator re-derives it inside for the eager regimes)
          val nEval = grams.filter(evalPred).select("g").distinct().count()
          val t0 = System.nanoTime()
          val r = TextOps.decontaminate(
              grams.filter(!evalPred), grams.filter(evalPred), regime)
            .agg(count(lit(1)).as("docs"),
              coalesce(sum("n_overlap"), lit(0L)).as("overlaps"))
            .collect()(0)
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"dct","dir":"$dir","mod":$mod,"regime":"$regime",""" +
            s""""eval_grams":$nEval,"docs":${r.getLong(0)},""" +
            s""""overlaps":${r.getLong(1)},"sec":${f3(secs)},""" +
            s""""loadavg_before":$load}"""
        case "t21f" =>
          // optional 4th field: shuffle partitions for this spec — the
          // SCALE.md operating rule under test (size partitions so the
          // band-join build side fits the executor heap; 32 partitions
          // at 7.5M docs rebuilt the r8 OOM on this 8 GB bench VM)
          val (dir, b) = (parts(1), parts(2).toInt)
          val shuffleParts = if (parts.length > 3) parts(3) else null
          val saved = spark.conf.get("spark.sql.shuffle.partitions")
          val savedCoalesce =
            spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
          if (shuffleParts != null) {
            spark.conf.set("spark.sql.shuffle.partitions", shuffleParts)
            // AQE's post-shuffle coalescing would merge the small
            // partitions right back (it targets shuffle BYTES, but the
            // SHUFFLE_HASH build side inflates ~10x into an
            // UnsafeHashedRelation) — the operating rule is about the
            // BUILT size, so pin the partition count for the A/B
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          }
          try {
            val t0 = System.nanoTime()
            val pairs = TextOps.simhashPairs(spark, dir, Some(b)).count()
            val secs = (System.nanoTime() - t0) / 1e9
            s"""{"probe":"t21f","dir":"$dir","blocks":$b,"pairs":$pairs,""" +
              s""""shuffle_partitions":${if (shuffleParts == null) saved else shuffleParts},""" +
              s""""sec":${f3(secs)},"loadavg_before":$load}"""
          } finally {
            spark.conf.set("spark.sql.shuffle.partitions", saved)
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", savedCoalesce)
          }
        case "v08a" =>
          val dir = parts(1)
          val t0 = System.nanoTime()
          val r = VectorOps.semanticDedupAssigned(spark, dir)
            .agg(count(lit(1)).as("n"),
              countDistinct(col("cent_id")).as("cells"))
            .collect()(0)
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"v08a","dir":"$dir","assigned":${r.getLong(0)},""" +
            s""""cells":${r.getLong(1)},"sec":${f3(secs)},""" +
            s""""loadavg_before":$load}"""
        case "v08f" =>
          val dir = parts(1)
          val t0 = System.nanoTime()
          val r = graft.SparkEntry.queries("v08_semantic_dedup")(spark, dir)
            .agg(count(lit(1)).as("dropped"),
              coalesce(sum("n_dom"), lit(0L)).as("pairs"))
            .collect()(0)
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"v08f","dir":"$dir","dropped":${r.getLong(0)},""" +
            s""""pairs":${r.getLong(1)},"sec":${f3(secs)},""" +
            s""""loadavg_before":$load}"""
        case "sdct" =>
          // streaming ingest-decontamination throughput: the docs
          // parquet dir IS the landing; AvailableNow drains it through
          // the stateless GramOverlapCount probe into a parquet sink
          // (realistic: ingest writes its output)
          val (dir, mod) = (parts(1), parts(2).toInt)
          val evalGrams = TextOps.wordFiveGrams(spark, dir)
            .filter(col("doc_id") % mod === 0).select("g")
          val src = s"$dir/documents.parquet"
          val docSchema = spark.read.parquet(src).schema
          val outDir = java.nio.file.Files.createTempDirectory("sdct_out").toString
          val ckpt = java.nio.file.Files.createTempDirectory("sdct_ckpt").toString
          val t0 = System.nanoTime()
          val stream = spark.readStream.schema(docSchema)
            .option("maxFilesPerTrigger", 8).parquet(src)
          val q = graft.streaming.EventStream.writeParquet(
            graft.streaming.EventStream.decontaminateDocs(stream, evalGrams),
            outDir, ckpt)
          q.awaitTermination()
          val secs = (System.nanoTime() - t0) / 1e9
          val r = spark.read.parquet(outDir)
            .agg(count(lit(1)).as("docs"),
              sum(col("contaminated").cast("long")).as("bad")).collect()(0)
          s"""{"probe":"sdct","dir":"$dir","mod":$mod,"docs":${r.getLong(0)},""" +
            s""""contaminated":${r.getLong(1)},"sec":${f3(secs)},""" +
            s""""docs_per_sec":${f3(r.getLong(0) / secs)},"loadavg_before":$load}"""
        case "spat" =>
          // streaming session-pattern throughput over the events dir
          // (funnel V C{1,2} P per user, 30-min sessions); emitted hits
          // are only the sessions the stream CLOSED — the throughput
          // number is rows drained per second
          val dir = parts(1)
          val nIn = graft.Tables(spark, dir, "events").count()
          val outDir = java.nio.file.Files.createTempDirectory("spat_out").toString
          val ckpt = java.nio.file.Files.createTempDirectory("spat_ckpt").toString
          val t0 = System.nanoTime()
          val events = graft.streaming.EventStream.readEvents(
            spark, s"$dir/events.parquet", maxFilesPerTrigger = 8)
          val hits = graft.streaming.PatternStream.matchPatternSessions(
            events, "user_id", "ts",
            Seq("V" -> (col("event_type") === "view"),
              "C" -> (col("event_type") === "click"),
              "P" -> (col("event_type") === "purchase")),
            "V C{1,2} P", col("value"), gapMinutes = 30)
          val q = graft.streaming.EventStream.writeParquet(hits.toDF(), outDir, ckpt)
          q.awaitTermination()
          val secs = (System.nanoTime() - t0) / 1e9
          val nHits = spark.read.parquet(outDir).count()
          s"""{"probe":"spat","dir":"$dir","events":$nIn,"hits":$nHits,""" +
            s""""sec":${f3(secs)},"events_per_sec":${f3(nIn / secs)},""" +
            s""""loadavg_before":$load}"""
        case other => sys.error(s"unknown probe '$other'")
      }
      println(json)
    }
    spark.stop()
  }
}
