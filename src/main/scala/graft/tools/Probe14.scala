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
      case other => sys.error(s"unknown probe spec: $other")
    }
    spark.stop()
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
