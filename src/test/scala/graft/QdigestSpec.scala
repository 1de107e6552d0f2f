package graft

import org.apache.spark.sql.functions._

/** q-digest mergeable percentile sketch family (round 12, functions/
  * QDigest.scala): exactness below the compression threshold (the f22
  * oracle contract), canonical-bytes merge identity in that regime, the
  * ≤ 32·n/k rank-error envelope above it, and loud contract failures.
  */
class QdigestSpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** Exact discrete quantile: value at sorted position ⌈q·n⌉. */
  private def exactQ(sorted: IndexedSeq[Long], q: Double): Long =
    sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)

  test("uncompressed regime is exact: quantiles, rank_of, count") {
    val s = registered
    import s.implicits._
    // 5000 values with duplicates, all under k=8192 rows total
    val vals = (1 to 5000).map(i => ((i * 37) % 1000).toLong * 13)
    vals.toDF("v").createOrReplaceTempView("qd_in")
    val row = s.sql("""
      SELECT qdigest_quantile(d, 0.5) AS p50,
             qdigest_quantile(d, 0.9) AS p90,
             qdigest_quantile(d, 0.001) AS p_low,
             qdigest_quantile(d, 1.0) AS p_max,
             qdigest_rank_of(d, 6000) AS r6000,
             qdigest_count(d) AS n
      FROM (SELECT qdigest_agg(v, 8192) AS d FROM qd_in)""").head()
    val sorted = vals.sorted
    assert(row.getLong(0) == exactQ(sorted, 0.5))
    assert(row.getLong(1) == exactQ(sorted, 0.9))
    assert(row.getLong(2) == exactQ(sorted, 0.001))
    assert(row.getLong(3) == sorted.last)
    assert(row.getDouble(4) == vals.count(_ <= 6000).toDouble / vals.size)
    assert(row.getLong(5) == vals.size.toLong)
  }

  test("merge identities: sharded rollup and pairwise merge are bit-identical to direct") {
    val s = registered
    import s.implicits._
    val vals = (1 to 4000).map(i => (i % 8, ((i * 2654435761L) & 0xFFFFL)))
    vals.toDF("shard", "v").createOrReplaceTempView("qd_sh")
    val direct = s.sql(
      "SELECT qdigest_agg(v, 65536) AS d FROM qd_sh").head().getAs[Array[Byte]](0)
    val rolled = s.sql("""
      SELECT qdigest_merge_agg(sk) AS d
      FROM (SELECT qdigest_agg(v, 65536) AS sk FROM qd_sh GROUP BY shard)""")
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, rolled),
      "uncompressed rollup must equal the digest of the union, byte for byte")
    val paired = s.sql("""
      SELECT qdigest_merge(a, b) AS d FROM (
        SELECT qdigest_agg(CASE WHEN shard < 4 THEN v END, 65536) AS a,
               qdigest_agg(CASE WHEN shard >= 4 THEN v END, 65536) AS b
        FROM qd_sh)""").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, paired))
  }

  test("saturated regime: rank error within 32*n/k at n=50k, k=256") {
    val s = registered
    import s.implicits._
    val n = 50000
    // odd-constant multiply mod 2^32 is a bijection: n distinct values
    val vals = (1 to n).map(i => (i.toLong * 2654435761L) & 0xFFFFFFFFL)
    vals.toDF("v").createOrReplaceTempView("qd_sat")
    val sorted = vals.sorted
    val bound = 32.0 * n / 256
    val row = s.sql("""
      SELECT qdigest_quantile(d, 0.1), qdigest_quantile(d, 0.5),
             qdigest_quantile(d, 0.9), qdigest_quantile(d, 0.99),
             qdigest_count(d)
      FROM (SELECT qdigest_agg(v, 256) AS d FROM qd_sat)""").head()
    assert(row.getLong(4) == n.toLong, "count is exact in every regime")
    for ((q, idx) <- Seq(0.1 -> 0, 0.5 -> 1, 0.9 -> 2, 0.99 -> 3)) {
      val est = row.getLong(idx)
      val trueRank = sorted.count(_ <= est) // digest max-value answers are >= some real rank
      val target = math.ceil(q * n)
      assert(math.abs(trueRank - target) <= bound,
        s"q=$q: rank of estimate $est is $trueRank, target $target, bound $bound")
    }
  }

  test("saturated merge keeps the envelope and exact count") {
    val s = registered
    import s.implicits._
    val n = 40000
    val vals = (1 to n).map(i => (i % 16, (i.toLong * 2654435761L) & 0xFFFFFFFFL))
    vals.toDF("shard", "v").createOrReplaceTempView("qd_satm")
    val sorted = vals.map(_._2).sorted
    val row = s.sql("""
      SELECT qdigest_quantile(d, 0.5), qdigest_count(d)
      FROM (SELECT qdigest_merge_agg(sk) AS d
            FROM (SELECT qdigest_agg(v, 256) AS sk FROM qd_satm GROUP BY shard))""")
      .head()
    assert(row.getLong(1) == n.toLong)
    val trueRank = sorted.count(_ <= row.getLong(0))
    // merged shard digests: error still O(n/k); generous 2x slack for
    // the post-merge re-compression round
    assert(math.abs(trueRank - n / 2.0) <= 2 * 32.0 * n / 256)
  }

  test("contract failures are loud: value range, k range, quantile range") {
    val s = registered
    import s.implicits._
    Seq(-1L).toDF("v").createOrReplaceTempView("qd_neg")
    val e1 = intercept[Exception] {
      s.sql("SELECT qdigest_agg(v, 1024) FROM qd_neg").collect()
    }
    assert(e1.getMessage != null)
    Seq(1L).toDF("v").createOrReplaceTempView("qd_one")
    val e2 = intercept[Exception] {
      s.sql("SELECT qdigest_agg(v, 4) FROM qd_one").collect()
    }
    assert(e2.getMessage.contains("qdigest_agg k") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("qdigest_agg k")))
    val e3 = intercept[Exception] {
      s.sql("SELECT qdigest_quantile(qdigest_agg(v, 1024), 1.5) FROM qd_one").collect()
    }
    assert(e3.getMessage != null)
  }

  test("foreign binaries are rejected loudly, not misparsed (r12 review)") {
    val s = registered
    import s.implicits._
    Seq(1L, 2L, 3L).toDF("v").createOrReplaceTempView("qd_foreign")
    val e = intercept[Exception] {
      s.sql("SELECT qdigest_count(kmv_sketch(v, 64)) FROM qd_foreign").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a qdigest")), msgs(e).mkString(" | "))
  }

  test("empty digest: quantile is null, count is zero") {
    val s = registered
    import s.implicits._
    Seq(Option.empty[java.lang.Long]).toDF("v").createOrReplaceTempView("qd_empty")
    val row = s.sql("""
      SELECT qdigest_quantile(d, 0.5), qdigest_count(d)
      FROM (SELECT qdigest_agg(v, 1024) AS d FROM qd_empty)""").head()
    assert(row.isNullAt(0))
    assert(row.getLong(1) == 0L)
  }

  /** Reference fold: the pre-r14 boxed level-synchronous compress
    * (sort snapshot + generated per level, hash-map state) — the r14
    * sequential-merge compress must produce the IDENTICAL surviving
    * node set for any input, or its serialized digests would silently
    * diverge from every digest written before the optimization. */
  private def referenceCompress(counts0: Map[Long, Long], n: Long, k: Int): Map[Long, Long] = {
    val LeafDepth = 32
    def depth(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)
    val t = n / k
    if (t <= 0) return counts0
    val counts = scala.collection.mutable.Map(counts0.toSeq: _*)
    val byDepth = Array.fill(LeafDepth + 1)(new scala.collection.mutable.ArrayBuffer[Long])
    counts.keysIterator.foreach { id => byDepth(depth(id)) += id }
    var d = LeafDepth
    while (d >= 1) {
      val ids = byDepth(d).toArray
      java.util.Arrays.sort(ids)
      ids.foreach { id =>
        val c = counts.getOrElse(id, -1L)
        if (c >= 0) {
          val sib = id ^ 1L
          val parent = id >>> 1
          val pc = counts.getOrElse(parent, -1L)
          val sum = c + counts.getOrElse(sib, 0L) + math.max(pc, 0L)
          if (sum <= t) {
            if (pc < 0) byDepth(d - 1) += parent
            counts.update(parent, sum)
            counts.remove(id)
            counts.remove(sib)
          }
        }
      }
      d -= 1
    }
    counts.toMap
  }

  test("r14 array compress is fold-identical to the reference (randomized)") {
    val rnd = new scala.util.Random(20260818)
    (1 to 30).foreach { trial =>
      val k = Seq(16, 64, 256, 1024)(trial % 4)
      val nVals = 200 + rnd.nextInt(5000)
      // mix of dense runs (sibling/parent folds) and sparse tails
      val vals = (1 to nVals).map { _ =>
        if (rnd.nextBoolean()) rnd.nextInt(500).toLong
        else (rnd.nextLong() & 0xFFFFFFFFL)
      }
      val buf = graft.functions.Qdigest.emptyBuf(k)
      // disable the online schedule so compress() runs exactly once,
      // on a known pre-state shared with the reference
      buf.nextCompress = Int.MaxValue
      vals.foreach(v => buf.add(v, 1L))
      var pre = Map.empty[Long, Long]
      buf.counts.foreachEntry((id, c) => pre += (id -> c))
      val expected = referenceCompress(pre, buf.n, k)
      buf.compress()
      var got = Map.empty[Long, Long]
      buf.counts.foreachEntry((id, c) => got += (id -> c))
      assert(got == expected,
        s"trial $trial (k=$k, n=$nVals): ${got.size} vs ${expected.size} nodes")
    }
  }
}
