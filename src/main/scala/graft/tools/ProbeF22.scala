package graft.tools

import org.apache.spark.sql.functions._

/** r14 f22 stage attribution (guide §1.1/§1.4): time each pipeline
  * prefix of f22 with the noop sink to locate the cost — first-level
  * qdigest_agg build, second-level merge, scalar finalizers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProbeF22
  */
object ProbeF22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.engine.GraftSession.create()
    graft.functions.GraftFunctions.register(s)
    def base = graft.Tables(s, sfDir, "lineitem")
      .selectExpr("l_returnflag", "l_linestatus",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents")
    def lvl1 = base.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("qdigest_agg(cents, 65536)").as("sk"))
    def lvl2 = lvl1.groupBy(col("l_returnflag"))
      .agg(expr("qdigest_merge_agg(sk)").as("d"))
    def fin = lvl2.selectExpr(
      "l_returnflag",
      "qdigest_quantile(d, 0.5) AS p50_cents",
      "qdigest_quantile(d, 0.9) AS p90_cents",
      "qdigest_quantile(d, 0.99) AS p99_cents",
      "ROUND(qdigest_rank_of(d, 5000000), 6) AS frac_le_50k",
      "qdigest_count(d) AS n_rows")
    def finQOnly = lvl2.selectExpr("l_returnflag",
      "qdigest_quantile(d, 0.5) AS p50_cents")
    def finCountOnly = lvl2.selectExpr("l_returnflag",
      "qdigest_count(d) AS n_rows")
    def time(name: String, f: => Unit): Unit = {
      // warm pass then two timed passes, min
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-12s ${ts.min}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("scan", noop(base))
    time("lvl1", noop(lvl1))
    time("lvl1+2", noop(lvl2))
    time("count-only", noop(finCountOnly))
    time("q-only", noop(finQOnly))
    time("full", noop(fin))
    // micro: raw Buf.add throughput on the actual value stream (single
    // thread, one map — the partial stage runs 32 of these in parallel)
    val cents = base.select("cents").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    println(s"PROBE n=${cents.length} distinct=${cents.distinct.length}")
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val buf = graft.functions.Qdigest.emptyBuf(65536)
      var i = 0
      while (i < cents.length) { buf.add(cents(i), 1L); i += 1 }
      val t1 = System.nanoTime()
      val ser = graft.functions.Qdigest.serialize(buf)
      val t2 = System.nanoTime()
      println(f"PROBE add-all    ${(t1 - t0) / 1e9}%.3f s  (map ${buf.counts.size}, ser ${(t2 - t1) / 1e9}%.3f s, ${ser.length} B)")
    }
    // attribution: pure map adds (no compress: huge k), then raw map
    (1 to 2).foreach { _ =>
      val t0 = System.nanoTime()
      val buf = graft.functions.Qdigest.emptyBuf(1 << 20)
      var i = 0
      while (i < cents.length) { buf.add(cents(i), 1L); i += 1 }
      println(f"PROBE add-nocompress ${(System.nanoTime() - t0) / 1e9}%.3f s (map ${buf.counts.size})")
    }
    (1 to 2).foreach { _ =>
      val t0 = System.nanoTime()
      val m = new graft.functions.LongLongCounts(16)
      var i = 0
      while (i < cents.length) { m.addTo((1L << 32) | cents(i), 1L); i += 1 }
      println(f"PROBE rawmap     ${(System.nanoTime() - t0) / 1e9}%.3f s (map ${m.size})")
    }
    // r15: isolate the TypedImperativeAggregate.update() interface cost
    // (child eval + boxing + dispatch) from the ObjectHashAggregate
    // machinery — drive the REAL agg update loop over an InternalRow
    // cursor and compare to add-all above.
    locally {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, SpecificInternalRow}
      import org.apache.spark.sql.types.LongType
      val agg = graft.functions.QdigestAgg(BoundReference(0, LongType, nullable = false), 65536)
      (1 to 3).foreach { _ =>
        val row = new SpecificInternalRow(Seq(LongType))
        var buf = agg.createAggregationBuffer()
        val t0 = System.nanoTime()
        var i = 0
        while (i < cents.length) {
          row.setLong(0, cents(i)); buf = agg.update(buf, row); i += 1
        }
        println(f"PROBE agg-update ${(System.nanoTime() - t0) / 1e9}%.3f s (map ${buf.counts.size})")
      }
    }
    s.stop()
  }
}
