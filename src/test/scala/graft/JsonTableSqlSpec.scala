package graft

import graft.sql.JsonTableSql

/** SQL/JSON JSON_TABLE rewrite (round 12, sql/JsonTableSql.scala):
  * end-to-end through plain spark.sql (the injected-parser path),
  * ordinality, type mapping, literal safety, and the named rejections.
  */
class JsonTableSqlSpec extends SparkSpec {

  test("flattens a JSON array of objects with typed columns, end to end") {
    import spark.implicits._
    Seq(
      (1L, """[{"ln":1,"qty":10.5},{"ln":2,"qty":3.0}]"""),
      (2L, """[{"ln":1,"qty":7.25}]"""),
      (3L, """[]"""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "doc").createOrReplaceTempView("jt_docs")
    val rows = spark.sql("""
      SELECT d.id, t.ln, t.qty
      FROM jt_docs d, JSON_TABLE(d.doc, 'lax $[*]'
        COLUMNS (ln INTEGER PATH 'lax $.ln',
                 qty DOUBLE PATH 'lax $.qty')) AS t
      ORDER BY d.id, t.ln""").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq ==
      Seq((1L, 1, 10.5), (1L, 2, 3.0), (2L, 1, 7.25)))
    // empty arrays and NULL docs produce zero rows (inner semantics)
  }

  test("nested object row path, ordinality, and VARCHAR mapping") {
    import spark.implicits._
    Seq((1L, """{"items":[{"sku":"a"},{"sku":"b"},{"sku":"c"}]}"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_nested")
    val rows = spark.sql("""
      SELECT t.pos, t.sku
      FROM jt_nested, JSON_TABLE(doc, 'lax $.items[*]'
        COLUMNS (pos FOR ORDINALITY,
                 sku VARCHAR PATH 'lax $.sku')) t
      ORDER BY t.pos""").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("missing column paths are NULL (lax semantics); strict downgrades") {
    import spark.implicits._
    Seq((1L, """[{"a":1},{"b":2}]""")).toDF("id", "doc")
      .createOrReplaceTempView("jt_lax")
    val rows = spark.sql("""
      SELECT t.a FROM jt_lax, JSON_TABLE(doc, 'strict $[*]'
        COLUMNS (a INTEGER PATH 'strict $.a')) t""").collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSet ==
      Set(1, null))
  }

  test("statements without the keyword and literals containing it pass untouched") {
    val plain = "SELECT 1 AS x FROM t WHERE s = 'call JSON_TABLE(x) later'"
    assert(JsonTableSql.rewrite(plain) == plain)
    assert(JsonTableSql.rewrite("SELECT 2") == "SELECT 2")
  }

  test("unsupported forms fail loudly with the feature named") {
    def err(q: String): String =
      intercept[Exception](JsonTableSql.rewrite(q)).getMessage
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (x INT PATH '$.x'))")
      .contains("alias"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $.a' COLUMNS (x INT PATH '$.x')) t")
      .contains("array"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (x INT PATH '$.x', NESTED PATH '$.y[*]' COLUMNS (z INT PATH '$.z'))) t")
      .contains("NESTED"))
    assert(err("SELECT * FROM JSON_TABLE(doc, 'lax $[*]' COLUMNS (x INT PATH '$.x')) t")
      .contains("follow a relation"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (x GEOMETRY PATH '$.x')) t")
      .contains("unsupported column type"))
    // omitted alias followed by a clause keyword: the keyword must NOT
    // be captured as the alias (r12 advice — WHERE became the alias and
    // the query silently reshaped)
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (x INT PATH '$.x')) WHERE x > 1")
      .contains("alias"))
  }
}
