package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.GraftSession

/** Round-13 probe: the IVF cell-assignment argmax spellings A/B'd warm
  * in ONE JVM (the graft-host-noise protocol — same session, each
  * variant run twice, second time reported, loadavg printed).
  *
  * argmax:<sfDir>[:<k>] — builds the corpus × broadcast-centroids
  * scored frame once (k sampled centroids, default 100), then times
  * three consumers that all compute the SAME per-vector argmax cell:
  *
  *   window   — row_number() OVER (PARTITION BY id_v ORDER BY ccos
  *              DESC, cent_id) = 1: exchanges + sorts all N·k rows
  *              (the pre-r13 spelling);
  *   maxby    — Spark max_by(cent_id, struct(ccos, -cent_id)): the
  *              struct key forces a SortAggregate, which still sorts
  *              N·k rows by group key;
  *   argmaxby — graft arg_max_by (TypedImperativeAggregate →
  *              ObjectHashAggregate): O(1) state, partial merge
  *              collapses to N rows before the exchange (the shipped
  *              r13 spelling).
  *
  * Each variant's result is checksummed (count + sum(cent_id) + sum of
  * id_v·cent_id) and the probe FAILS if any spelling disagrees — the
  * A/B is only meaningful over identical answers.
  *
  * Usage: runMain graft.tools.Probe14 argmax:/tmp/sf1
  */
object Probe14 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach {
      case s if s.startsWith("argmax:") =>
        val parts = s.stripPrefix("argmax:").split(":")
        argmax(spark, parts(0), if (parts.length > 1) parts(1).toInt else 100)
      case s if s.startsWith("annspj:") =>
        val parts = s.stripPrefix("annspj:").split(":")
        annspj(spark, parts(0).toLong,
          if (parts.length > 1) parts(1).toInt else 32)
      case "hllexact" => hllexact(spark)
      case other => sys.error(s"unknown probe spec: $other")
    }
    spark.stop()
  }

  /** annspj:<nVectors>[:<nBuckets>] — the IVF-PQ SERVING layout
    * measured (r12 verdict #6): PQ codes stored with their cell id in
    * a GraftTable `bucket(nBuckets, cent_id)` — the inverted-list file
    * layout — vs the same rows unbucketed. A probe query (one query
    * vector, its 4 probed cells as a static `cent_id IN`, the 2048-row
    * ADC LUT broadcast, top-3 by summed subspace distance) must prune
    * the bucketed scan to the probed cells' buckets; the unbucketed
    * plan scans everything. m=8 subspaces, k=100 cells; codes rows =
    * 8·nVectors. Both spellings run twice (warm reported), answers
    * checksum-equal or the probe fails. */
  private def annspj(spark: SparkSession, nVectors: Long, nBuckets: Int): Unit = {
    import graft.store.GraftTable
    val base = java.nio.file.Files.createTempDirectory("probe14ann").toString
    // unique catalog name per invocation: Spark caches catalog
    // instances by name, so a second annspj spec in the same JVM would
    // otherwise collide on the first call's warehouse/namespace
    val cat = s"p14_$nVectors"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    // synthetic codes: cell + per-subspace codewords, deterministic
    val codes = spark.range(nVectors).selectExpr(
        "id", "pmod(hash(id), 100) AS cent_id")
      .selectExpr("cent_id", "id",
        "explode(transform(sequence(0, 7), j -> " +
          "struct(j AS j, CAST(pmod(hash(id * 8 + j), 256) AS INT) AS c))) AS e")
      .selectExpr("cent_id", "id", "e.j AS j", "e.c AS c")
    GraftTable.create(spark, s"$base/db/codes_b", codes,
      bucketBy = Some(("cent_id", nBuckets)))
    GraftTable.create(spark, s"$base/db/codes_u", codes)
    // one query's ADC LUT: (j, c) -> dd, 2048 rows, broadcast
    spark.range(2048).selectExpr("CAST(id DIV 256 AS INT) AS j",
        "CAST(id % 256 AS INT) AS c",
        "CAST(pmod(hash(id), 1000) AS DOUBLE) / 1000.0 AS dd")
      .createOrReplaceTempView("p14_lut")
    def probe(tbl: String): (Double, Long, Option[Int]) = {
      val q = spark.sql(
        s"""SELECT k.id AS id_c, SUM(l.dd) AS adc
            FROM $cat.db.$tbl k JOIN p14_lut l ON l.j = k.j AND l.c = k.c
            WHERE k.cent_id IN (3, 17, 42, 71)
            GROUP BY k.id ORDER BY adc, id_c LIMIT 3""")
      val t0 = System.nanoTime()
      val rows = q.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val sum = rows.map(r => r.getLong(0) * 31 + math.round(r.getDouble(1) * 1e6)).sum
      val occ = "(\\d+) occupied buckets".r
        .findFirstMatchIn(q.queryExecution.executedPlan.toString).map(_.group(1).toInt)
      (sec, sum, occ)
    }
    probe("codes_b"); probe("codes_u") // warm page cache + JIT
    val (bSec, bSum, bOcc) = probe("codes_b")
    val (uSec, uSum, _) = probe("codes_u")
    require(bSum == uSum, s"answers diverge: $bSum vs $uSum")
    println(f"""PROBE14 annspj: vectors=$nVectors buckets=$nBuckets """ +
      f"""bucketed=$bSec%.2fs (occupied=${bOcc.getOrElse(-1)}) """ +
      f"""unbucketed=$uSec%.2fs loadavg=$loadavg""")
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def loadavg: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
    catch { case _: Exception => "n/a" }

  private def checksum(assigned: DataFrame): (Long, Long, Long) = {
    val r = assigned.agg(
      count(lit(1)), sum(col("cent_id")),
      sum(col("id_v") * col("cent_id"))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** hllexact — probe the exact-below-saturation device (r12 verdict
    * #7) on the two HLL paths f11/f19 ride: does the estimator return
    * EXACT integers for small cardinalities?
    *
    *  - `approx_count_distinct` (Spark-native HyperLogLogPlusPlus):
    *    Spark's impl is DENSE-ONLY (no sparse mode) with linear-
    *    counting small-range correction — expected biased.
    *  - `hll_sketch_estimate(hll_sketch_agg(x))` (DataSketches HLL,
    *    default lgK=12): starts in exact coupon LIST/SET modes —
    *    expected exact until the SET->HLL promotion, including through
    *    `hll_union_agg` of unsaturated sketches (the f19 shape).
    *
    * Prints n, truth, both estimates, and the union-merge estimate per
    * cardinality rung; the verdict decides whether f19 can carry a
    * full oracle like f20/f22/f23. */
  private def hllexact(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    for (n <- Seq(100L, 500L, 1000L, 2000L, 4000L, 8000L, 16000L, 64000L)) {
      // 3x duplication so distinct != rows; 8 partitions force merges
      val df = spark.range(n * 3).repartition(8).selectExpr(s"id % $n AS x",
        s"CAST(id % 4 AS INT) AS g")
      val r = df.agg(
        approx_count_distinct(col("x")).as("acd"),
        expr("CAST(hll_sketch_estimate(hll_sketch_agg(x)) AS BIGINT)").as("ds"),
        expr("CAST(hll_sketch_estimate(hll_sketch_agg(x, 21)) AS BIGINT)").as("ds21"))
        .head()
      // the f19 shape: per-group sketches union-merged
      val u = df.groupBy(col("g")).agg(expr("hll_sketch_agg(x)").as("sk"))
        .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)"))
        .head().getLong(0)
      val u21 = df.groupBy(col("g")).agg(expr("hll_sketch_agg(x, 21)").as("sk"))
        .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)"))
        .head().getLong(0)
      println(s"PROBE14 hllexact n=$n acd=${r.getLong(0)} ds=${r.getLong(1)} " +
        s"ds21=${r.getLong(2)} ds_union=$u ds21_union=$u21 " +
        s"exact_acd=${r.getLong(0) == n} exact_ds=${r.getLong(1) == n} " +
        s"exact_ds21=${r.getLong(2) == n} exact_union=${u == n} exact_u21=${u21 == n}")
    }
  }

  private def argmax(spark: SparkSession, sfDir: String, k: Int): Unit = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val base = graft.Tables(spark, sfDir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("vec_id", "v", "vector_dot(v, v) AS n2")
    val n = base.count()
    val step = math.max(1L, n / k)
    val cents = base.filter(col("vec_id") % step === 0).limit(k)
      .select(col("vec_id").as("cent_id"), col("v").as("vc"), col("n2").as("nc2"))
    def scored = base
      .select(col("vec_id").as("id_v"), col("v").as("va"), col("n2").as("na2"))
      .crossJoin(broadcast(cents))
      .selectExpr("id_v", "cent_id",
        "vector_dot(va, vc) / (SQRT(na2) * SQRT(nc2)) AS ccos")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "window" -> (() => scored
        .withColumn("crn", row_number().over(
          Window.partitionBy(col("id_v")).orderBy(col("ccos").desc, col("cent_id"))))
        .filter(col("crn") === 1).select(col("id_v"), col("cent_id"))),
      "maxby" -> (() => scored.groupBy(col("id_v"))
        .agg(expr("max_by(cent_id, struct(ccos, -cent_id))").as("cent_id"))),
      "argmaxby" -> (() => scored.groupBy(col("id_v"))
        .agg(expr("arg_max_by(cent_id, struct(ccos, -cent_id))").as("cent_id"))))

    println(s"PROBE14 argmax: n=$n vectors, k=$k centroids, loadavg=$loadavg")
    var ref: Option[(Long, Long, Long)] = None
    variants.foreach { case (name, mk) =>
      val (_, cold) = time(checksum(mk()))          // warms JIT/cache
      val (cs, warm) = time(checksum(mk()))         // reported
      ref match {
        case None => ref = Some(cs)
        case Some(exp) => require(cs == exp,
          s"$name checksum $cs != $exp — spellings disagree, A/B void")
      }
      println(f"PROBE14 $name%-9s cold=$cold%7.2fs warm=$warm%7.2fs checksum=$cs")
    }
    println(s"PROBE14 done loadavg=$loadavg")
  }
}
