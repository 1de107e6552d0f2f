package graft

/** Deterministic argmax/argmin with struct keys and struct payloads
  * (round 13, functions/ArgMaxBy.scala): window-spelling parity, NULL
  * semantics, wide payloads riding the buffer, and the plan contract —
  * ObjectHashAggregate, never the SortAggregate Spark's own max_by
  * degrades to on struct buffers (the r12 verdict-#3 motivation).
  */
class ArgMaxBySpec extends SparkSpec {
  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("arg_max_by matches ROW_NUMBER crn=1 with the struct tie-breaker") {
    val s = registered
    Tables(s, sf(), "orders").createOrReplaceTempView("amb_orders")
    val agg = s.sql("""
      SELECT o_custkey, arg_max_by(o_orderkey, struct(o_totalprice, -o_orderkey)) AS k
      FROM amb_orders GROUP BY o_custkey""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val win = s.sql("""
      SELECT o_custkey, o_orderkey AS k FROM (
        SELECT o_custkey, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM amb_orders) WHERE rn = 1""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(agg.nonEmpty && agg == win)
  }

  test("arg_min_by mirrors with ascending key; scalar keys work too") {
    val s = registered
    val got = s.sql("""
      SELECT g, arg_min_by(x, struct(y, x)) AS lo, arg_max_by(x, y) AS hi
      FROM VALUES ('a', 'p', 3), ('a', 'q', 1), ('a', 'r', 2),
                  ('b', 's', 7), ('b', 't', 9) AS t(g, x, y)
      GROUP BY g ORDER BY g""").collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("a", "q", "p"), ("b", "s", "t")))
  }

  test("NULL ordering keys are skipped; all-NULL group returns NULL") {
    val s = registered
    val r = s.sql("""
      SELECT g, arg_max_by(x, y) FROM VALUES
        ('a', 'keep', 1), ('a', 'skip', CAST(NULL AS INT)),
        ('b', 'gone', CAST(NULL AS INT)) AS t(g, x, y)
      GROUP BY g ORDER BY g""").collect()
    assert(r(0).getString(1) == "keep")
    assert(r(1).isNullAt(1))
  }

  test("struct payloads (wide vectors) survive partial merge byte-identically") {
    val s = registered
    import s.implicits._
    // 200 groups x 40 rows spread over 8 partitions so partial merge
    // genuinely fires; payload carries an array the size of an embedding
    val df = s.range(8000).repartition(8)
      .selectExpr("id % 200 AS g", "id AS v",
        "transform(sequence(0, 63), i -> CAST(id * 64 + i AS DOUBLE)) AS vec")
    df.createOrReplaceTempView("amb_wide")
    val got = s.sql("""
      SELECT g, arg_max_by(struct(v, vec), struct(CAST(v % 7 AS DOUBLE), -v)) AS w
      FROM amb_wide GROUP BY g""")
      .selectExpr("g", "w.v AS v", "aggregate(w.vec, 0D, (a, x) -> a + x) AS vs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // expected: per group, max of (v % 7, -v) -> the SMALLEST v with the
    // largest residue; recompute driver-side
    val rows = (0L until 8000L).map(id => (id % 200, id))
    val exp = rows.groupBy(_._1).map { case (g, vs) =>
      val best = vs.map(_._2).minBy(v => (-(v % 7).toDouble, v))
      (g, best, (0 until 64).map(i => (best * 64 + i).toDouble).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == exp)
  }

  test("plan contract: ObjectHashAggregate with partial merge, no sort, no window") {
    val s = registered
    val df = s.range(1000).selectExpr("id % 10 AS g", "id AS v")
      .groupBy("g").agg(org.apache.spark.sql.functions.expr(
        "arg_max_by(v, struct(CAST(v AS DOUBLE), -v))").as("m"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
    assert(p.contains("partial_arg_max_by"), p.take(1500))
    assert(!p.contains("SortAggregate") && !p.contains("Sort ["), p.take(1500))
  }

  test("unorderable ordering key is a loud analysis error") {
    val s = registered
    val e = intercept[Exception](s.sql(
      "SELECT arg_max_by(x, map(x, y)) FROM VALUES ('a', 1) AS t(x, y)").collect())
    assert(e.getMessage.contains("unorderable") || e.getMessage.contains("DATATYPE"),
      e.getMessage)
  }
}
