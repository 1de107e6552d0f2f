package graft

import graft.sql.UnnestSql

/** Trino UNNEST rewrite (round 12, sql/UnnestSql.scala): arrays, maps,
  * multi-array zip with NULL padding, WITH ORDINALITY — end to end
  * through plain spark.sql — plus literal safety and named rejections.
  */
class UnnestSqlSpec extends SparkSpec {

  test("single array, with and without ordinality, end to end") {
    import spark.implicits._
    Seq((1L, Seq("a", "b", "c")), (2L, Seq("z")), (3L, Seq.empty[String]))
      .toDF("id", "arr").createOrReplaceTempView("un_arr")
    val rows = spark.sql("""
      SELECT d.id, u.x, u.pos
      FROM un_arr d CROSS JOIN UNNEST(d.arr) WITH ORDINALITY AS u(x, pos)
      ORDER BY d.id, u.pos""").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (2L, "z", 1L)))
    val plain = spark.sql(
      "SELECT u.x FROM un_arr d, UNNEST(d.arr) AS u(x) WHERE d.id = 2").collect()
    assert(plain.map(_.getString(0)).toSeq == Seq("z"))
  }

  test("map argument explodes to key/value rows (arity-routed)") {
    import spark.implicits._
    Seq((1L, Map("a" -> 10, "b" -> 20))).toDF("id", "m")
      .createOrReplaceTempView("un_map")
    val rows = spark.sql("""
      SELECT u.k, u.v FROM un_map, UNNEST(m) AS u(k, v) ORDER BY u.k""").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 10), ("b", 20)))
  }

  test("multi-array zip pads the shorter array with NULLs (Trino semantics)") {
    import spark.implicits._
    Seq((1L, Seq(1, 2, 3), Seq("x", "y"))).toDF("id", "a", "b")
      .createOrReplaceTempView("un_zip")
    val rows = spark.sql("""
      SELECT u.n, u.s, u.pos
      FROM un_zip, UNNEST(a, b) WITH ORDINALITY AS u(n, s, pos)
      ORDER BY u.pos""").collect()
    assert(rows.map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "x", 1L), (2, "y", 2L), (3, null, 3L)))
    // both empty -> zero rows (the descending-sequence trap)
    Seq((1L, Seq.empty[Int], Seq.empty[String])).toDF("id", "a", "b")
      .createOrReplaceTempView("un_zip0")
    assert(spark.sql(
      "SELECT u.n FROM un_zip0, UNNEST(a, b) AS u(n, s)").count() == 0)
  }

  test("statements without the keyword and literals containing it pass untouched") {
    val plain = "SELECT 1 FROM t WHERE s = 'UNNEST(arr) is a Trino thing'"
    assert(UnnestSql.rewrite(plain) == plain)
    // comments and quoted identifiers are masked too (r12 review: the
    // rewriters run on EVERY statement through the injected parser)
    val commented = "SELECT 1 AS x -- Trino used UNNEST(tags) here\nFROM t"
    assert(UnnestSql.rewrite(commented) == commented)
    val block = "SELECT 1 /* JSON_TABLE(doc) and UNNEST(a) */ AS x FROM t"
    assert(UnnestSql.rewrite(block) == block)
    assert(graft.sql.JsonTableSql.rewrite(block) == block)
    val quotedId = "SELECT `UNNEST(weird)` FROM t"
    assert(UnnestSql.rewrite(quotedId) == quotedId)
    // and they still parse through plain spark.sql end to end
    assert(spark.sql("SELECT 1 AS x -- UNNEST(tags) in a comment\n").head().getInt(0) == 1)
  }

  test("array-of-rows: >= 3 fields splat positionally through the alias list (r13)") {
    import spark.implicits._
    // literal constructor, full Trino spelling (row() needs the
    // TrinoDialect script path — plain spark.sql spells struct())
    val lit = graft.sql.GraftSql.execute(spark, """
      SELECT d.id, u.a, u.b, u.c FROM (SELECT 1 AS id) d,
        UNNEST(array(row(1, 'x', 2.5), row(2, 'y', 7.25))) AS u(a, b, c)
      ORDER BY u.a""").head.collect()
    assert(lit.map(r => (r.getInt(1), r.getString(2),
        r.getDecimal(3).doubleValue())).toSeq ==
      Seq((1, "x", 2.5), (2, "y", 7.25)))
    // COLUMN of array<struct> + WITH ORDINALITY (names come from the
    // alias list, not the struct's own field names)
    Seq((10L, Seq((1, "p"), (2, "q")))).toDF("id", "rs")
      .selectExpr("id", "transform(rs, r -> struct(r._1 AS f1, r._2 AS f2, r._1 * 10 AS f3)) AS rs")
      .createOrReplaceTempView("un_rows")
    val col3 = spark.sql("""
      SELECT t.id, u.x, u.y, u.z, u.pos FROM un_rows t
      CROSS JOIN UNNEST(t.rs) WITH ORDINALITY AS u(x, y, z, pos)
      ORDER BY u.pos""").collect()
    assert(col3.map(r => (r.getInt(1), r.getString(2), r.getInt(3), r.getLong(4))).toSeq ==
      Seq((1, "p", 10, 1L), (2, "q", 20, 2L)))
  }

  test("unsupported forms fail loudly with the feature named") {
    def err(q: String): String =
      intercept[Exception](UnnestSql.rewrite(q)).getMessage
    assert(err("SELECT * FROM t, UNNEST(arr)").contains("alias"))
    assert(err("SELECT * FROM t, UNNEST(a, b) AS u(x)").contains("2 columns"))
    assert(err("SELECT * FROM UNNEST(array(1,2)) AS u(x)").contains("follow a relation"))
    // Trino's UNNEST(array(row(...))) AS t(a, b): type-blind rewriter
    // would lower it as a MAP and die on an opaque __un_map_k analysis
    // error — must be a named rejection instead (r12 advice)
    assert(err("SELECT * FROM t, UNNEST(array(row(1, 'a'), row(2, 'b'))) AS u(x, y)")
      .contains("array(row"))
  }
}
