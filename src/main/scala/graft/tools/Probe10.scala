package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.TextOps

/** Round-10 scale probes (r9 verdict #2/#3/#4) — one process,
  * sequential specs, one JSON line each with pre-run loadavg (the
  * Probe8/9 A/B discipline).
  *
  *  - `dprobe:<dir>:<mod>` — the auto decontamination regime's
  *    hit-rate sample (bloom build + 100k-gram LocalLimit probe)
  *    timed ALONE against one full corpus-gram pass on the same data:
  *    the SCALE.md "sample cost must be << one corpus pass" row. Also
  *    reports the sampled hit rate for the %mod eval split (the
  *    saturated-synthetic shape) and for a disjoint suffixed suite
  *    (the realistic ~0%-hit shape).
  *  - `pmerge:<L>:<B>:<iters>` — PatternStream open-session state
  *    A/B: (state ++ incoming).sortBy (the r9 spelling) vs sorted
  *    merge of a pre-sorted L-row state with a B-row batch — the
  *    per-micro-batch cost near the maxSessionRows ceiling. Pure
  *    driver-side CPU (the stateful op runs this per key per batch).
  *  - `bandauto:<dir>[:<B>]` — t21's band join at DEFAULT session
  *    config after the round-10 partition-sizing rule: the operator
  *    must size its own exchange (SCALE.md (c) showed 32 partitions
  *    OOM at 7.5M docs; the rule books the partitions from the banded
  *    row estimate instead of the caller).
  *
  * Usage: runMain graft.tools.Probe10 <spec> [<spec> ...]
  */
object Probe10 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Probe10 dprobe:<dir>:<mod>|pmerge:<L>:<B>:<iters>|bandauto:<dir>[:<B>] ...")
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
        case "dprobe" =>
          val (dir, mod) = (parts(1), parts(2).toInt)
          val grams = TextOps.wordFiveGrams(spark, dir)
          val train = grams.filter(col("doc_id") % mod =!= 0)
          val evalHot = grams.filter(col("doc_id") % mod === 0)
            .select("g").distinct().localCheckpoint()
          val nEval = evalHot.count()
          // the probe under test: bloom build + bounded prefix probe
          def probe(eg: org.apache.spark.sql.DataFrame, n: Long): (Double, Double) = {
            val t0 = System.nanoTime()
            val bf = TextOps.bloomBytesFor(eg, n)
            val s = train.select("g").limit(TextOps.DecontamProbeSampleGrams)
              .agg(sum(when(call_function("might_contain", lit(bf), col("g")), 1L)
                .otherwise(0L)).as("h"), count(lit(1)).as("n")).head()
            val secs = (System.nanoTime() - t0) / 1e9
            (secs, s.getLong(0).toDouble / math.max(1L, s.getLong(1)))
          }
          val (hotSec, hotRate) = probe(evalHot, nEval)
          val evalCold = evalHot.selectExpr("concat(g, '_zzz') AS g").localCheckpoint()
          val (coldSec, coldRate) = probe(evalCold, nEval)
          // the yardstick: ONE full pass over the corpus gram stream
          val t1 = System.nanoTime()
          val nTrain = train.select("g").count()
          val passSec = (System.nanoTime() - t1) / 1e9
          s"""{"probe":"dprobe","dir":"$dir","mod":$mod,"eval_grams":$nEval,""" +
            s""""train_grams":$nTrain,"probe_sec_hot":${f3(hotSec)},""" +
            s""""hit_rate_hot":${f3(hotRate)},"probe_sec_cold":${f3(coldSec)},""" +
            s""""hit_rate_cold":${f3(coldRate)},"full_pass_sec":${f3(passSec)},""" +
            s""""loadavg_before":$load}"""
        case "pmerge" =>
          val (nL, nB, iters) = (parts(1).toInt, parts(2).toInt, parts(3).toInt)
          val rnd = new scala.util.Random(7)
          val state = List.tabulate(nL)(i =>
            (i * 1000L, rnd.nextLong() & 0xff, rnd.nextDouble()))
          val batch0 = List.fill(nB)(
            (rnd.nextInt(nL) * 1000L + 500L, rnd.nextLong() & 0xff, rnd.nextDouble()))
          val ord = Ordering.Tuple3(Ordering.Long, Ordering.Long,
            Ordering.Double.TotalOrdering)
          def timeIt(body: => List[(Long, Long, Double)]): (Double, Int) = {
            var res: List[(Long, Long, Double)] = Nil
            val t0 = System.nanoTime()
            var i = 0
            while (i < iters) { res = body; i += 1 }
            ((System.nanoTime() - t0) / 1e9 / iters, res.length)
          }
          val (sortSec, n1) = timeIt((state ++ batch0).sortBy(r => (r._1, r._2, r._3)))
          val (mergeSec, n2) = timeIt {
            val incoming = batch0.sortBy(r => (r._1, r._2, r._3))
            val out = scala.collection.mutable.ListBuffer[(Long, Long, Double)]()
            var x = state
            var y = incoming
            while (x.nonEmpty && y.nonEmpty) {
              if (ord.lteq(x.head, y.head)) { out += x.head; x = x.tail }
              else { out += y.head; y = y.tail }
            }
            out ++= x; out ++= y
            out.toList
          }
          require(n1 == n2 && n1 == nL + nB)
          s"""{"probe":"pmerge","state_rows":$nL,"batch_rows":$nB,"iters":$iters,""" +
            s""""resort_sec_per_batch":${f3(sortSec)},""" +
            s""""merge_sec_per_batch":${f3(mergeSec)},""" +
            s""""speedup":${f3(sortSec / mergeSec)},"loadavg_before":$load}"""
        case "sndi" =>
          // indexed streaming near-dup throughput: drain the corpus's
          // documents.parquet through nearDupDocsIndexed (pipeline
          // rate incl. per-batch index probe + both labeled commits)
          val dir = parts(1)
          val maxFiles = if (parts.length > 2) parts(2).toInt else 4
          val tmp = java.nio.file.Files.createTempDirectory("sndi").toString
          val stream = spark.readStream
            .schema(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("source",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("text",
                org.apache.spark.sql.types.StringType))))
            .option("maxFilesPerTrigger", maxFiles)
            .parquet(s"$dir/documents.parquet")
          val t0 = System.nanoTime()
          val q = graft.streaming.EventStream.nearDupDocsIndexed(
            stream, s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")
          q.awaitTermination()
          val secs = (System.nanoTime() - t0) / 1e9
          val out = graft.store.GraftTable.load(spark, s"$tmp/out").read()
          val nDocs = out.count()
          val nDups = out.filter(col("is_dup")).count()
          s"""{"probe":"sndi","dir":"$dir","docs":$nDocs,"dups":$nDups,""" +
            s""""sec":${f3(secs)},"docs_per_sec":${f3(nDocs / secs)},""" +
            s""""max_files_per_trigger":$maxFiles,"loadavg_before":$load}"""
        case "sdecon" =>
          // Semantic-decontamination tiers at one corpus (round 10):
          // exact broadcast regime vs banded-LSH regime vs the
          // streaming ingest kernel applied batch-side (same Project,
          // so the rate IS the stream's per-row ceiling). Suite =
          // every 20th vec_id with id/20 under the cap (deterministic,
          // ~rep-0 rows); train = everything else. Contamination-grade
          // threshold 0.8 — the regime the operators are built for.
          val dir = parts(1)
          val evalCap = if (parts.length > 2) parts(2).toLong else 2000L
          val all = graft.Tables(spark, dir, "embeddings")
            .select("vec_id", "embedding")
          val evalSet = all.filter(col("vec_id") % 20 === 0 &&
            col("vec_id") / 20 < evalCap).localCheckpoint()
          val train = all.filter(col("vec_id") % 20 =!= 0)
          val (nT, nE) = (train.count(), evalSet.count())
          def timeCount(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
            val t0 = System.nanoTime()
            val n = df.count()
            ((System.nanoTime() - t0) / 1e9, n)
          }
          val (sx, fx) = timeCount(
            graft.operators.VectorOps.semanticDecontaminate(train, evalSet, 0.8))
          val (sb, fb) = timeCount(
            graft.operators.VectorOps.semanticDecontaminateBanded(train, evalSet, 0.8))
          val (sk, nk) = timeCount(
            graft.streaming.EventStream.decontaminateEmbeddings(train, evalSet, 0.8))
          s"""{"probe":"sdecon","dir":"$dir","n_train":$nT,"n_eval":$nE,""" +
            s""""sec_exact":${f3(sx)},"flagged_exact":$fx,""" +
            s""""sec_banded":${f3(sb)},"flagged_banded":$fb,""" +
            s""""sec_kernel":${f3(sk)},"kernel_rows_per_s":${(nk / math.max(sk, 1e-9)).toLong},""" +
            s""""loadavg_before":$load}"""
        case "bandauto" =>
          val dir = parts(1)
          val b = if (parts.length > 2) Some(parts(2).toInt) else None
          val t0 = System.nanoTime()
          val pairs = TextOps.simhashPairs(spark, dir, b).count()
          val secs = (System.nanoTime() - t0) / 1e9
          s"""{"probe":"bandauto","dir":"$dir","blocks":${b.getOrElse(-1)},""" +
            s""""pairs":$pairs,"sec":${f3(secs)},""" +
            s""""shuffle_partitions":"${spark.conf.get("spark.sql.shuffle.partitions")}",""" +
            s""""loadavg_before":$load}"""
        case other => sys.error(s"unknown probe spec '$other'")
      }
      // one marker-prefixed line per spec — greppable under sbt noise
      println(s"PROBE10> $json")
    }
    spark.stop()
  }
}
