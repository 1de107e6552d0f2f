package graft

import org.apache.spark.sql.functions._

/** KMV bottom-k distinct sketch family (round 11, functions/KmvSketch
  * .scala): exactness below saturation (the f20 oracle contract), the
  * 1/√k error envelope above it, and the merge identities that make
  * the sketch safe to roll up across 100 TB of partials.
  */
class KmvSpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("unsaturated sketches are exact: distinct, union, intersect, jaccard") {
    val s = registered
    import s.implicits._
    // two overlapping value sets, all well under k
    val a = (1 to 300).map(i => ("a", i * 7L)) // 300 distinct
    val b = (1 to 260).map(i => ("b", i * 13L)) // 260 distinct
    val df = (a ++ b ++ a.take(50)).toDF("side", "v") // dup rows change nothing
    df.createOrReplaceTempView("kmv_in")
    val row = s.sql("""
      SELECT kmv_distinct_est(s1) AS d1, kmv_distinct_est(s2) AS d2,
             kmv_intersect_est(s1, s2) AS ix,
             kmv_distinct_est(kmv_union(s1, s2)) AS un,
             kmv_jaccard_est(s1, s2) AS j
      FROM (SELECT kmv_sketch(CASE WHEN side = 'a' THEN v END, 1024) AS s1,
                   kmv_sketch(CASE WHEN side = 'b' THEN v END, 1024) AS s2
            FROM kmv_in)""").head()
    val setA = a.map(_._2).toSet
    val setB = b.map(_._2).toSet
    assert(row.getDouble(0) == setA.size.toDouble)
    assert(row.getDouble(1) == setB.size.toDouble)
    assert(row.getDouble(2) == (setA & setB).size.toDouble)
    assert(row.getDouble(3) == (setA | setB).size.toDouble)
    assert(math.abs(row.getDouble(4) -
      (setA & setB).size.toDouble / (setA | setB).size) < 1e-12)
  }

  test("saturated regime: 1/sqrt(k) error envelope at 50k distinct, k=1024") {
    val s = registered
    import s.implicits._
    val n = 50000
    val df = (1 to n).map(i => i * 2654435761L).toDF("v") // fixed, distinct
    df.createOrReplaceTempView("kmv_sat")
    val est = s.sql(
      "SELECT kmv_distinct_est(kmv_sketch(v, 1024)) FROM kmv_sat").head().getDouble(0)
    val relErr = math.abs(est - n) / n
    // sigma ~ 1/sqrt(k-2) = 3.1%; 0.12 is ~4 sigma on deterministic data
    assert(relErr < 0.12, s"est $est vs $n: relErr $relErr")
    assert(est > 1024, "saturated estimate must extrapolate past k")
  }

  test("merge identities: pairwise union, distributed partials, and rollup are bit-identical") {
    val s = registered
    import s.implicits._
    val rows = (1 to 30000).map(i => (i % 7, i * -7046029254386353131L)) // 7 groups, saturating k=256
    val df = rows.toDF("g", "v")
    df.createOrReplaceTempView("kmv_m")
    // sketch(A union B) == kmv_union(sketch(A), sketch(B)) — bottom-k of a
    // union is the bottom-k of the bottom-k's
    val direct = s.sql("SELECT kmv_sketch(v, 256) FROM kmv_m").head().getAs[Array[Byte]](0)
    val paired = s.sql("""
      SELECT kmv_union(s1, s2) FROM
        (SELECT kmv_sketch(CASE WHEN g < 3 THEN v END, 256) AS s1,
                kmv_sketch(CASE WHEN g >= 3 THEN v END, 256) AS s2 FROM kmv_m)""")
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, paired), "pairwise union != direct sketch")
    // partition-count independence: the partial-merge path lands on the
    // same sketch regardless of physical layout
    val repart = df.repartition(13).groupBy().agg(expr("kmv_sketch(v, 256)"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, repart), "partial merge not layout-invariant")
    // kmv_union_agg over stored per-group sketches == direct sketch
    val rollup = s.sql("""
      SELECT kmv_union_agg(sk) FROM
        (SELECT g, kmv_sketch(v, 256) AS sk FROM kmv_m GROUP BY g)""")
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, rollup), "union_agg rollup != direct sketch")
  }

  test("nulls are skipped; empty input yields an exact-zero sketch") {
    val s = registered
    import s.implicits._
    Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("v")
      .createOrReplaceTempView("kmv_n")
    assert(s.sql("SELECT kmv_distinct_est(kmv_sketch(v, 64)) FROM kmv_n")
      .head().getDouble(0) == 2.0)
    assert(s.sql(
      "SELECT kmv_distinct_est(kmv_sketch(v, 64)) FROM kmv_n WHERE v > 99")
      .head().getDouble(0) == 0.0)
    // union_agg over zero rows: empty exact sketch, not a crash
    assert(s.sql("""SELECT kmv_distinct_est(kmv_union_agg(sk)) FROM
        (SELECT kmv_sketch(v, 64) AS sk FROM kmv_n GROUP BY v) WHERE sk IS NULL""")
      .head().getDouble(0) == 0.0)
  }

  test("arity and k bounds reject loudly") {
    val s = registered
    val e1 = intercept[Exception](s.sql("SELECT kmv_sketch(1)").collect())
    assert(e1.getMessage.contains("kmv_sketch takes 2"), e1.getMessage)
    val e2 = intercept[Exception](s.sql("SELECT kmv_sketch(1, 4) ").collect())
    assert(e2.getMessage.contains("[16, 1048576]"), e2.getMessage)
  }
}
