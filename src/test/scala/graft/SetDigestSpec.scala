package graft

import org.apache.spark.sql.functions._

/** Trino setdigest family (round 12, functions/SetDigest.scala):
  * exactness below saturation (the f23 oracle contract), the 1/√k
  * Jaccard envelope above it, merge-vs-rescan bit-identity, the
  * saturating hash_counts multiplicities, and loud rejection of
  * foreign binaries.
  */
class SetDigestSpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("unsaturated digests are exact: cardinality, intersection, jaccard, counts") {
    val s = registered
    import s.implicits._
    val a = (1 to 300).map(i => ("a", i * 7L))
    val b = (1 to 260).map(i => ("b", i * 13L))
    val df = (a ++ b ++ a.take(50)).toDF("side", "v") // dup rows count in hash_counts only
    df.createOrReplaceTempView("sd_in")
    val row = s.sql("""
      SELECT set_digest_cardinality(s1) AS d1, set_digest_cardinality(s2) AS d2,
             intersection_cardinality(s1, s2) AS ix,
             jaccard_index(s1, s2) AS j,
             aggregate(map_values(hash_counts(s1)), 0L, (acc, c) -> acc + c) AS rows1
      FROM (SELECT make_set_digest(CASE WHEN side = 'a' THEN v END, 1024) AS s1,
                   make_set_digest(CASE WHEN side = 'b' THEN v END, 1024) AS s2
            FROM sd_in)""").head()
    val setA = a.map(_._2).toSet
    val setB = b.map(_._2).toSet
    assert(row.getLong(0) == setA.size.toLong)
    assert(row.getLong(1) == setB.size.toLong)
    assert(row.getLong(2) == (setA & setB).size.toLong)
    assert(math.abs(row.getDouble(3) -
      (setA & setB).size.toDouble / (setA | setB).size) < 1e-12)
    assert(row.getLong(4) == a.size + 50L) // 350 'a' rows incl. the dups
  }

  test("saturated regime: jaccard within the 1/sqrt(k) band at 40k-element sets, k=1024") {
    val s = registered
    import s.implicits._
    // A = 1..40000, B = 20001..60000 -> |A∩B| = 20000, |A∪B| = 60000, J = 1/3
    val rows = (1 to 40000).map(i => ("a", i.toLong)) ++
      (20001 to 60000).map(i => ("b", i.toLong))
    rows.toDF("side", "v").createOrReplaceTempView("sd_sat")
    val r = s.sql("""
      SELECT jaccard_index(s1, s2) AS j, set_digest_cardinality(s1) AS d1
      FROM (SELECT make_set_digest(CASE WHEN side = 'a' THEN v END, 1024) AS s1,
                   make_set_digest(CASE WHEN side = 'b' THEN v END, 1024) AS s2
            FROM sd_sat)""").head()
    val j = r.getDouble(0)
    // sigma ~ sqrt(J(1-J)/k) ≈ 1.5%; allow ~4 sigma on deterministic data
    assert(math.abs(j - 1.0 / 3) < 0.06, s"jaccard $j vs 1/3")
    val d1 = r.getLong(1)
    assert(math.abs(d1 - 40000.0) / 40000 < 0.12, s"cardinality $d1 vs 40000")
  }

  test("merge_set_digest rollup is bit-identical to the single-scan digest") {
    val s = registered
    import s.implicits._
    val rows = (1 to 30000).map(i => (i % 7, i * -7046029254386353131L))
    val df = rows.toDF("g", "v")
    df.createOrReplaceTempView("sd_merge")
    val direct = s.sql(
      "SELECT make_set_digest(v, 256) AS sk FROM sd_merge")
      .head().getAs[Array[Byte]]("sk")
    val rolled = s.sql("""
      SELECT merge_set_digest(sk) AS sk FROM
        (SELECT g, make_set_digest(v, 256) AS sk FROM sd_merge GROUP BY g)""")
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(direct, rolled),
      "per-group rollup must equal the one-scan digest byte-for-byte")
  }

  test("hash_counts multiplicities saturate at 32767, never wrap") {
    val s = registered
    import s.implicits._
    // one value repeated 40000 times > Short.MaxValue
    val df = (1 to 40000).map(_ => 42L).toDF("v")
    df.createOrReplaceTempView("sd_cap")
    val m = s.sql(
      "SELECT map_values(hash_counts(make_set_digest(v, 64))) AS cs FROM sd_cap")
      .head().getAs[scala.collection.Seq[Long]]("cs")
    assert(m.toSeq == Seq(32767L))
  }

  test("merge_set_digest preserves the max legal k through empty groups (r12 review)") {
    val s = registered
    import s.implicits._
    // k = 1<<20 is the documented max; a rollup must not clamp it to 16
    // via the old empty-buffer sentinel collision
    (1 to 500).map(i => (i % 5, i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("sd_maxk")
    val direct = s.sql(
      "SELECT make_set_digest(v, 1048576) AS sk FROM sd_maxk")
      .head().getAs[Array[Byte]]("sk")
    val rolled = s.sql("""SELECT merge_set_digest(sk) AS sk FROM
      (SELECT g, make_set_digest(v, 1048576) AS sk FROM sd_maxk GROUP BY g)""")
      .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(direct, rolled),
      "max-k digests must survive the rollup byte-for-byte")
    // an all-NULL group yields a canonical empty digest, cardinality 0
    val empty = s.sql(
      "SELECT set_digest_cardinality(merge_set_digest(CAST(NULL AS BINARY))) AS d FROM (SELECT 1)")
      .head().getLong(0)
    assert(empty == 0L)
  }

  test("foreign binaries are rejected loudly, not misparsed") {
    val s = registered
    import s.implicits._
    val e = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)).toDF("b")
        .selectExpr("set_digest_cardinality(b)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a setdigest")), s"got: ${msgs(e)}")
  }
}
