package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.VectorIndex

/** Round-14 probes for the ANN serving layer (r13 verdict #3/#7), run
  * under the graft-host-noise protocol: everything warm in ONE JVM,
  * each timed step run twice with the second time reported, loadavg
  * printed alongside.
  *
  * refine:<n>[:<n2>] — REAL index builds (k-means cells + trained PQ)
  * over n (and n2, default 3n) synthetic vectors, then per corpus
  * size: plain searchPq vs searchPq(refine = 5k/20k) wall times. The
  * claim under test: the exact re-rank adds CANDIDATE-sized work (a
  * probe-pruned assignments fetch semi-joined to `refine` broadcast
  * ids), so its overhead stays ~flat while the ADC scan cost tracks
  * the corpus.
  *
  * annmaint:<n>:<batches>[:<batchSize>] — builds the same real index,
  * then appends `batches` micro-batches through VectorIndex.append and
  * measures what the r13 verdict asked: probe-time pruning decay
  * (files read by a fixed probe on each table) and latency as appends
  * accumulate, then both again after maintain() — the numbers that
  * justify indexVectorsStream's maintainEvery cadence hook.
  *
  * Usage: runMain graft.tools.Probe15 refine:200000 annmaint:200000:16
  */
object Probe15 {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach {
      case s if s.startsWith("refine:") =>
        val p = s.stripPrefix("refine:").split(":")
        val n = p(0).toLong
        refine(spark, n, if (p.length > 1) p(1).toLong else 3 * n)
      case s if s.startsWith("annmaint:") =>
        val p = s.stripPrefix("annmaint:").split(":")
        annmaint(spark, p(0).toLong, p(1).toInt,
          if (p.length > 2) p(2).toLong else p(0).toLong / 40)
      case s if s.startsWith("bm25:") =>
        bm25(spark, s.stripPrefix("bm25:"))
      case other => sys.error(s"unknown probe spec: $other")
    }
    spark.stop()
  }

  private def loadavg(): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0)

  /** Deterministic synthetic embeddings: dim 16, hash-mixed floats in
    * [-1, 1) — enough cosine structure for k-means to split cells. */
  private def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n, 1, 32).toDF("vec_id").selectExpr("vec_id",
      """transform(sequence(0, 15), i ->
           CAST((pmod(hash(vec_id, i), 2000) - 1000) / 1000.0 AS FLOAT)) AS embedding""")

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
  /** warm-once, report the second run (the (w) protocol) */
  private def warm2(f: => Long): (Long, Double) = { timed(f); timed(f) }

  private def buildAt(spark: SparkSession, n: Long): (VectorIndex, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"p15_$n").toString
    val (idx, tb) = timed(VectorIndex.build(spark, corpus(spark, n), root,
      nCentroids = 32, pqSubspaces = Some(8), pqCodewords = 32, codeBuckets = 32))
    println(f"[p15] built n=$n index (32 cells, PQ 8x32) in $tb%.1f s, loadavg ${loadavg()}")
    (idx, root)
  }

  private def refine(spark: SparkSession, n1: Long, n2: Long): Unit = {
    val q = Array.tabulate(16)(i => math.sin(i * 1.7).toFloat)
    Seq(n1, n2).foreach { n =>
      val (idx, _) = buildAt(spark, n)
      val (_, tPlain) = warm2(idx.searchPq(q, k = 10, nprobe = 4).count())
      val (_, tRf) = warm2(idx.searchPq(q, k = 10, nprobe = 4, refine = 200).count())
      println(f"[p15] refine n=$n: plain ADC $tPlain%.2f s, refine=200 $tRf%.2f s, " +
        f"overhead ${tRf - tPlain}%.2f s, loadavg ${loadavg()}")
    }
  }

  /** bm25:<sfDir> — the TextIndex serving claim: one BM25 query served
    * off the bucketed postings table vs the same query recomputed from
    * the raw corpus (the t31 path), warm A/B in one JVM. The index
    * read prunes to the query terms' buckets; the recompute pays the
    * full tokenize+explode scan per query. */
  private def bm25(spark: SparkSession, sfDir: String): Unit = {
    val docs = graft.Tables(spark, sfDir, "documents")
    val q = Seq("vector", "hash", "join")
    val root = java.nio.file.Files.createTempDirectory("p15_bm25").toString
    val (idx, tb) = timed(graft.operators.TextIndex.build(spark, docs, root))
    val nDocs = docs.count()
    println(f"[p15] built bm25 index over $nDocs docs in $tb%.1f s, loadavg ${loadavg()}")
    val post = graft.store.GraftTable.load(spark, s"$root/postings")
    val hs = {
      import spark.implicits._
      q.toDF("term").select(xxhash64(col("term"))).collect().map(_.getLong(0)).toIndexedSeq
    }
    val fAll = post.read().inputFiles.length
    val fQ = post.read(filters = Seq(col("term_h").isin(hs: _*))).inputFiles.length
    val (_, tServed) = warm2(idx.bm25TopK(q, 10).count())
    val (_, tDirect) = warm2(
      graft.SparkEntry.queries("t31_bm25_topk")(spark, sfDir).count())
    println(f"[p15] bm25 $sfDir: served $tServed%.2f s (reads $fQ/$fAll postings files), " +
      f"recompute $tDirect%.2f s, loadavg ${loadavg()}")
  }

  private def annmaint(spark: SparkSession, n: Long, batches: Int,
                       batchSize: Long): Unit = {
    val (idx, root) = buildAt(spark, n)
    val asg = graft.store.GraftTable.load(spark, s"$root/assignments")
    val codes = graft.store.GraftTable.load(spark, s"$root/pq_codes")
    val q = Array.tabulate(16)(i => math.cos(i * 0.9).toFloat)
    def filesRead(): (Int, Int, Int, Int) = {
      // the fixed probe's cells — the same pruning searchPq applies
      val probeCells = Seq(0L, 1L, 2L, 3L)
      val fa = asg.read(filters = Seq(col("cent_id").isin(probeCells: _*)))
        .inputFiles.length
      val fc = codes.read(filters = Seq(col("cent_id").isin(probeCells: _*)))
        .inputFiles.length
      (fa, asg.read().inputFiles.length, fc, codes.read().inputFiles.length)
    }
    def report(tag: String): Unit = {
      val (fa, ta, fc, tc) = filesRead()
      val (_, t) = warm2(idx.searchPq(q, k = 10, nprobe = 4).count())
      val (_, tr) = warm2(idx.searchPq(q, k = 10, nprobe = 4, refine = 200).count())
      println(f"[p15] $tag: asg files read $fa/$ta, codes files read $fc/$tc, " +
        f"probe $t%.2f s, refined $tr%.2f s, loadavg ${loadavg()}")
    }
    report("fresh build")
    var appended = 0L
    (0 until batches).foreach { b =>
      val batch = spark.range(n + b * batchSize, n + (b + 1) * batchSize, 1, 4)
        .toDF("vec_id").selectExpr("vec_id",
          """transform(sequence(0, 15), i ->
               CAST((pmod(hash(vec_id, i), 2000) - 1000) / 1000.0 AS FLOAT)) AS embedding""")
      appended += idx.append(batch)
      if ((b + 1) % math.max(1, batches / 4) == 0)
        report(s"after ${b + 1} appends ($appended rows)")
    }
    val (_, tm) = timed(idx.maintain())
    println(f"[p15] maintain() took $tm%.1f s")
    report(s"after maintain ($batches batches)")
  }
}
