package graft

import org.apache.spark.sql.functions._

/** Trino map-building aggregates + aggregate rewrites (round 12,
  * functions/MapAggs.scala + GraftFunctions): histogram / map_union /
  * multimap_agg map contents entry-for-entry (the f24 entry reduces
  * them to scalars for the cross-engine oracle), shuffle-serialization
  * roundtrips under forced partial merges, checksum order-insensitivity,
  * and the rewrite identities.
  */
class MapAggsSpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("histogram matches groupBy counts entry-for-entry, across 8 partials") {
    val s = registered
    import s.implicits._
    val rows = (1 to 5000).map(i => s"k${i % 37}")
    val df = rows.toDF("v").repartition(8) // force partial merge + wire roundtrip
    df.createOrReplaceTempView("hg_in")
    val m = s.sql("SELECT histogram(v) AS m FROM hg_in")
      .head().getAs[Map[String, Long]]("m")
    val expect = rows.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(m == expect)
  }

  test("histogram ignores NULLs; empty input yields an empty map") {
    val s = registered
    import s.implicits._
    Seq[Option[String]](Some("a"), None, Some("a"), None)
      .toDF("v").createOrReplaceTempView("hg_null")
    val m = s.sql("SELECT histogram(v) AS m FROM hg_null")
      .head().getAs[Map[String, Long]]("m")
    assert(m == Map("a" -> 2L))
    val e = s.sql("SELECT histogram(v) AS m FROM hg_null WHERE v = 'zzz'")
      .head().getAs[Map[String, Long]]("m")
    assert(e == Map.empty[String, Long])
  }

  test("map_union unions keys; NULL map rows are skipped; key-determined values survive") {
    val s = registered
    import s.implicits._
    val df = Seq(Some(Map("a" -> 1, "b" -> 2)), None, Some(Map("b" -> 2, "c" -> 3)))
      .toDF("m").repartition(3)
    df.createOrReplaceTempView("mu_in")
    val m = s.sql("SELECT map_union(m) AS m FROM mu_in")
      .head().getAs[Map[String, Int]]("m")
    assert(m == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("multimap_agg collects every value per key (NULL keys skipped, NULL values kept)") {
    val s = registered
    import s.implicits._
    val df = Seq(("x", Some(1)), ("y", Some(2)), ("x", Some(3)), ("x", None))
      .toDF("k", "v")
    df.createOrReplaceTempView("mm_in")
    val m = s.sql("SELECT multimap_agg(k, v) AS m FROM mm_in")
      .head().getAs[Map[String, scala.collection.Seq[Any]]]("m")
    assert(m.keySet == Set("x", "y"))
    assert(m("y").toSeq == Seq(2))
    assert(m("x").toSeq.sortBy(v => if (v == null) Int.MinValue else v.asInstanceOf[Int]) ==
      Seq(null, 1, 3))
  }

  test("checksum is order-insensitive, value-sensitive AND multiplicity-sensitive") {
    val s = registered
    import s.implicits._
    (1 to 1000).map(_.toLong).toDF("v").createOrReplaceTempView("ck_a")
    (1 to 1000).reverse.map(_.toLong).toDF("v").createOrReplaceTempView("ck_b")
    (2 to 1001).map(_.toLong).toDF("v").createOrReplaceTempView("ck_c")
    // {x, x, y} vs {y}: an XOR fold cancels the pair — a wrapping sum
    // must not (r12 review)
    Seq(7L, 7L, 9L).toDF("v").createOrReplaceTempView("ck_dup")
    Seq(9L).toDF("v").createOrReplaceTempView("ck_one")
    Seq(Some(9L), None, None).toDF("v").createOrReplaceTempView("ck_nulls")
    def ck(t: String): Seq[Byte] =
      s.sql(s"SELECT checksum(v) AS c FROM $t").head().getAs[Array[Byte]]("c").toSeq
    assert(ck("ck_a") == ck("ck_b"), "row order must not change the checksum")
    assert(ck("ck_a") != ck("ck_c"), "different values must change the checksum")
    assert(ck("ck_dup") != ck("ck_one"), "even-multiplicity rows must not cancel")
    assert(ck("ck_nulls") != ck("ck_one"), "NULL rows count with multiplicity")
    assert(ck("ck_a").size == 8, "8-byte varbinary")
    // empty input -> NULL, like Trino (r12 review: not 8 zero bytes)
    assert(s.sql("SELECT checksum(v) AS c FROM ck_a WHERE v < 0").head().isNullAt(0))
  }

  test("geometric_mean: zeros pull the mean to 0, negatives to NaN (Trino semantics)") {
    val s = registered
    import s.implicits._
    Seq(0.0, 4.0).toDF("x").createOrReplaceTempView("gm_zero")
    Seq(-2.0, 4.0).toDF("x").createOrReplaceTempView("gm_neg")
    assert(s.sql("SELECT geometric_mean(x) FROM gm_zero").head().getDouble(0) == 0.0)
    assert(s.sql("SELECT geometric_mean(x) FROM gm_neg").head().getDouble(0).isNaN)
  }

  test("VARBINARY keys aggregate by VALUE across partials (r12 advice: BinKey)") {
    // Array[Byte] has reference equality — without the BinKey wrapper
    // every row lands as a distinct key and the maps carry duplicates.
    // 8 partitions force partial-merge + serialize round-trips too.
    val s = registered
    val df = s.range(80).repartition(8)
      .selectExpr("CAST(CONCAT('k', id % 3) AS BINARY) AS bk", "id AS v")
    df.createOrReplaceTempView("bin_keys")
    val h = s.sql("SELECT histogram(bk) AS h FROM bin_keys")
      .selectExpr("cardinality(h) AS n",
        "element_at(h, CAST('k0' AS BINARY)) AS k0")
      .head()
    assert(h.getInt(0) == 3, s"histogram created duplicate binary keys: $h")
    assert(h.getLong(1) == 27L) // ids 0,3,...,78 -> 27 rows
    val mm = s.sql("SELECT multimap_agg(bk, v) AS m FROM bin_keys")
      .selectExpr("cardinality(m) AS n",
        "size(element_at(m, CAST('k1' AS BINARY))) AS n1").head()
    assert(mm.getInt(0) == 3 && mm.getInt(1) == 27, mm)
    val mu = s.sql(
      "SELECT map_union(map(bk, 1)) AS m FROM bin_keys")
      .selectExpr("cardinality(m) AS n").head()
    assert(mu.getInt(0) == 3, mu)
  }

  test("rewrites: geometric_mean, arbitrary ignores nulls, bitwise aggs") {
    val s = registered
    import s.implicits._
    Seq((null.asInstanceOf[String], 2.0, 12L), ("v", 8.0, 10L), ("v", 4.0, 6L))
      .toDF("sv", "x", "b").createOrReplaceTempView("rw_in")
    val r = s.sql("""
      SELECT geometric_mean(x) AS gm, arbitrary(sv) AS any_sv,
             bitwise_and_agg(b) AS ba, bitwise_or_agg(b) AS bo
      FROM rw_in""").head()
    assert(math.abs(r.getDouble(0) - 4.0) < 1e-12) // cbrt(2*8*4) = 4
    assert(r.getString(1) == "v")                  // nulls skipped
    assert(r.getLong(2) == (12L & 10L & 6L))
    assert(r.getLong(3) == (12L | 10L | 6L))
  }
}
