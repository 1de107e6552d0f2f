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

  test("NESTED PATH flattens the inner array with the OUTER default plan (round 13)") {
    import spark.implicits._
    Seq(
      (1L, """[{"okey":10,"lines":[{"ln":1},{"ln":2}]},{"okey":11,"lines":[]}]"""),
      (2L, """[{"okey":20}]"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_np")
    val rows = spark.sql("""
      SELECT d.id, t.okey, t.lpos, t.ln
      FROM jt_np d, JSON_TABLE(d.doc, 'lax $[*]'
        COLUMNS (okey BIGINT PATH 'lax $.okey',
                 NESTED PATH 'lax $.lines[*]' COLUMNS (
                   lpos FOR ORDINALITY,
                   ln INTEGER PATH 'lax $.ln'))) AS t
      ORDER BY d.id, t.okey, t.lpos""").collect()
    def opt[T](r: org.apache.spark.sql.Row, i: Int, get: Int => T): Any =
      if (r.isNullAt(i)) null else get(i)
    // OUTER default plan: parents with empty/absent nested arrays emit
    // ONE row with NULL nested columns (okey 11 and 20)
    assert(rows.map(r => (r.getLong(0), r.getLong(1),
      opt(r, 2, r.getInt), opt(r, 3, r.getInt))).toSeq ==
      Seq((1L, 10L, 1, 1), (1L, 10L, 2, 2), (1L, 11L, null, null),
          (2L, 20L, null, null)))
  }

  test("NESTED chains: two levels, per-level ordinality, OUTER at each level (r13)") {
    import spark.implicits._
    Seq(
      (1L, """[{"okey":10,"lines":[{"ln":1,"tags":["a","b"]},{"ln":2,"tags":[]}]},
               {"okey":11,"lines":[]}]""".replaceAll("\\s+", "")),
      (2L, """[{"okey":20}]"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_deep")
    val rows = spark.sql("""
      SELECT d.id, t.okey, t.ln, t.tpos, t.tag
      FROM jt_deep d, JSON_TABLE(d.doc, 'lax $[*]'
        COLUMNS (okey BIGINT PATH 'lax $.okey',
                 NESTED PATH 'lax $.lines[*]' COLUMNS (
                   ln INTEGER PATH 'lax $.ln',
                   NESTED PATH 'lax $.tags[*]' COLUMNS (
                     tpos FOR ORDINALITY,
                     tag VARCHAR PATH 'lax $')))) AS t
      ORDER BY d.id, t.okey, t.ln, t.tpos""").collect()
    def o[T](r: org.apache.spark.sql.Row, i: Int, g: Int => T): Any =
      if (r.isNullAt(i)) null else g(i)
    // line (10, 1) has 2 tags; line (10, 2) has an EMPTY tags array ->
    // one OUTER-padded row; order 11 has no lines at all -> one row
    // with every nested column NULL; order 20 has no lines key -> same
    assert(rows.map(r => (r.getLong(0), r.getLong(1), o(r, 2, r.getInt),
        o(r, 3, r.getInt), o(r, 4, r.getString))).toSeq ==
      Seq((1L, 10L, 1, 1, "a"), (1L, 10L, 1, 2, "b"), (1L, 10L, 2, null, null),
          (1L, 11L, null, null, null), (2L, 20L, null, null, null)))
  }

  test("sibling NESTED paths take the UNION plan: per-sibling rows, shared padding (r13)") {
    import spark.implicits._
    Seq(
      (1L, """[{"okey":10,"lines":[{"ln":1},{"ln":2}],"tags":[7]},{"okey":11}]"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_sib")
    val rows = spark.sql("""
      SELECT t.okey, t.ln, t.lpos, t.tag, t.tpos
      FROM jt_sib d, JSON_TABLE(d.doc, 'lax $[*]'
        COLUMNS (okey BIGINT PATH 'lax $.okey',
                 NESTED PATH 'lax $.lines[*]' COLUMNS (
                   lpos FOR ORDINALITY, ln INTEGER PATH 'lax $.ln'),
                 NESTED PATH 'lax $.tags[*]' COLUMNS (
                   tpos FOR ORDINALITY, tag INTEGER PATH 'lax $'))) AS t
      ORDER BY t.okey, t.lpos NULLS LAST, t.tpos NULLS LAST""").collect()
    def o[T](r: org.apache.spark.sql.Row, i: Int, g: Int => T): Any =
      if (r.isNullAt(i)) null else g(i)
    // UNION plan: order 10 -> 2 lines rows (tag cols NULL) then 1 tags
    // row (line cols NULL); order 11 has NEITHER array -> ONE padded row
    assert(rows.map(r => (r.getLong(0), o(r, 1, r.getInt), o(r, 2, r.getInt),
        o(r, 3, r.getInt), o(r, 4, r.getInt))).toSeq ==
      Seq((10L, 1, 1, null, null), (10L, 2, 2, null, null),
          (10L, null, null, 7, 1), (11L, null, null, null, null)))
  }

  test("column-level behaviors: DEFAULT ON EMPTY fills, NULL ON ERROR no-ops, ERROR rejects (r13)") {
    import spark.implicits._
    Seq((1L, """[{"a":1},{"b":2}]""")).toDF("id", "doc")
      .createOrReplaceTempView("jt_beh")
    val rows = spark.sql("""
      SELECT t.a, t.b FROM jt_beh, JSON_TABLE(doc, 'lax $[*]'
        COLUMNS (a INTEGER PATH 'lax $.a' DEFAULT -1 ON EMPTY,
                 b INTEGER PATH 'lax $.b' NULL ON ERROR)) t
      ORDER BY t.a""").collect()
    assert(rows.map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getInt(1))).toSeq ==
      Seq((-1, 2), (1, null)))
    // string default, both-clause same default, through the wire seam
    val s2 = spark.sql("""
      SELECT t.s FROM jt_beh, JSON_TABLE(doc, 'lax $[*]'
        COLUMNS (s VARCHAR PATH 'lax $.missing'
                 DEFAULT 'none' ON EMPTY DEFAULT 'none' ON ERROR)) t""").collect()
    assert(s2.map(_.getString(0)).toSeq == Seq("none", "none"))
    def err(q: String): String =
      intercept[Exception](JsonTableSql.rewrite(q)).getMessage
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (" +
      "x INT PATH '$.x' ERROR ON EMPTY)) t").contains("ERROR ON"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (" +
      "x INT PATH '$.x' DEFAULT 1 ON EMPTY DEFAULT 2 ON ERROR)) t")
      .contains("DIFFERENT defaults"))
  }

  test("PLAN DEFAULT (OUTER, UNION) and an explicit default-plan PLAN are no-ops (r14)") {
    import spark.implicits._
    Seq(
      (1L, """[{"okey":10,"lines":[{"ln":1},{"ln":2}],"tags":[7]},{"okey":11}]"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_pd")
    def run(planClause: String, pathNames: Boolean): Seq[(Long, Any, Any)] = {
      val (rn, ln, tn) = if (pathNames) (" AS r", " AS l", " AS g") else ("", "", "")
      spark.sql(s"""
        SELECT t.okey, t.ln, t.tag
        FROM jt_pd d, JSON_TABLE(d.doc, 'lax $$[*]'$rn
          COLUMNS (okey BIGINT PATH 'lax $$.okey',
                   NESTED PATH 'lax $$.lines[*]'$ln COLUMNS (ln INTEGER PATH 'lax $$.ln'),
                   NESTED PATH 'lax $$.tags[*]'$tn COLUMNS (tag INTEGER PATH 'lax $$'))
          $planClause) AS t
        ORDER BY t.okey, t.ln NULLS LAST, t.tag NULLS LAST""").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getInt(1),
          if (r.isNullAt(2)) null else r.getInt(2))).toSeq
    }
    // the default plan, spelled three ways, gives identical rows:
    // order 10 -> line rows 1,2 (tag NULL) + one tag row 7; order 11
    // (neither array) -> one fully padded row
    val base = run("", pathNames = false)
    assert(base == Seq((10L, 1, null), (10L, 2, null), (10L, null, 7),
      (11L, null, null)))
    assert(run("PLAN DEFAULT (OUTER, UNION)", pathNames = false) == base)
    assert(run("PLAN DEFAULT (OUTER)", pathNames = false) == base)
    assert(run("PLAN (r OUTER (l UNION g))", pathNames = true) == base)
  }

  test("PLAN INNER parent/child drops parent elements with no child rows (r14)") {
    import spark.implicits._
    Seq(
      (1L, """[{"okey":10,"lines":[{"ln":1},{"ln":2}]},{"okey":11,"lines":[]},{"okey":12}]"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_inner")
    def run(planClause: String): Seq[(Long, Int)] =
      spark.sql(s"""
        SELECT t.okey, t.ln
        FROM jt_inner d, JSON_TABLE(d.doc, 'lax $$[*]' AS r
          COLUMNS (okey BIGINT PATH 'lax $$.okey',
                   NESTED PATH 'lax $$.lines[*]' AS l COLUMNS (
                     ln INTEGER PATH 'lax $$.ln'))
          $planClause) AS t
        ORDER BY t.okey, t.ln""").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // INNER: orders 11 (empty lines) and 12 (no lines key) vanish
    val expected = Seq((10L, 1), (10L, 2))
    assert(run("PLAN (r INNER l)") == expected)
    assert(run("PLAN DEFAULT (INNER)") == expected)
  }

  test("PLAN CROSS siblings build the product; an empty sibling empties it (r14)") {
    import spark.implicits._
    Seq(
      (1L, """[{"okey":10,"lines":[{"ln":1},{"ln":2}],"tags":[7,8]},{"okey":11,"tags":[9]}]"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_cross")
    val rows = spark.sql("""
      SELECT t.okey, t.ln, t.tag
      FROM jt_cross d, JSON_TABLE(d.doc, 'lax $[*]' AS r
        COLUMNS (okey BIGINT PATH 'lax $.okey',
                 NESTED PATH 'lax $.lines[*]' AS l COLUMNS (ln INTEGER PATH 'lax $.ln'),
                 NESTED PATH 'lax $.tags[*]' AS g COLUMNS (tag INTEGER PATH 'lax $'))
        PLAN (r OUTER (l CROSS g))) AS t
      ORDER BY t.okey, t.ln NULLS LAST, t.tag NULLS LAST""").collect()
    def o(r: org.apache.spark.sql.Row, i: Int): Any = if (r.isNullAt(i)) null else r.getInt(i)
    // order 10: 2 lines x 2 tags = 4 product rows; order 11 has NO
    // lines -> empty CROSS product -> the OUTER parent pads ONE row
    assert(rows.map(r => (r.getLong(0), o(r, 1), o(r, 2))).toSeq ==
      Seq((10L, 1, 7), (10L, 1, 8), (10L, 2, 7), (10L, 2, 8),
          (11L, null, null)))
  }

  test("siblings below the outermost level and nesting siblings lower correctly (r14)") {
    import spark.implicits._
    // one order, two lines; EACH line carries sibling arrays tags +
    // notes, and tags itself NESTS a subtags level — exercises both
    // restrictions r13 rejected (sibling in a nested block, sibling
    // that itself nests)
    Seq((1L,
      """[{"okey":10,"lines":[
           {"ln":1,"tags":[{"t":7,"subs":["a","b"]}],"notes":["n1"]},
           {"ln":2}]}]""".replaceAll("\\s+", "")))
      .toDF("id", "doc").createOrReplaceTempView("jt_deep_sib")
    val rows = spark.sql("""
      SELECT t.okey, t.ln, t.tg, t.sub, t.note
      FROM jt_deep_sib d, JSON_TABLE(d.doc, 'lax $[*]'
        COLUMNS (okey BIGINT PATH 'lax $.okey',
                 NESTED PATH 'lax $.lines[*]' COLUMNS (
                   ln INTEGER PATH 'lax $.ln',
                   NESTED PATH 'lax $.tags[*]' COLUMNS (
                     tg INTEGER PATH 'lax $.t',
                     NESTED PATH 'lax $.subs[*]' COLUMNS (
                       sub VARCHAR PATH 'lax $')),
                   NESTED PATH 'lax $.notes[*]' COLUMNS (
                     note VARCHAR PATH 'lax $')))) AS t
      ORDER BY t.ln, t.tg NULLS LAST, t.sub NULLS LAST, t.note NULLS LAST""").collect()
    def o[T](r: org.apache.spark.sql.Row, i: Int, g: Int => T): Any =
      if (r.isNullAt(i)) null else g(i)
    // line 1 (UNION of tags-chain and notes): tag 7 expands its 2 subs
    // -> 2 rows (note NULL), then the note row (tag cols NULL); line 2
    // has NEITHER sibling -> one padded row
    assert(rows.map(r => (r.getLong(0), o(r, 1, r.getInt), o(r, 2, r.getInt),
        o(r, 3, r.getString), o(r, 4, r.getString))).toSeq ==
      Seq((10L, 1, 7, "a", null), (10L, 1, 7, "b", null),
          (10L, 1, null, null, "n1"), (10L, 2, null, null, null)))
  }

  test("output columns keep DECLARATION order — NESTED before scalars included (r14)") {
    import spark.implicits._
    Seq((1L, """[{"a":1,"bs":[{"b":2}],"c":3}]"""))
      .toDF("id", "doc").createOrReplaceTempView("jt_order")
    val df = spark.sql("""
      SELECT t.* FROM jt_order d, JSON_TABLE(d.doc, 'lax $[*]'
        COLUMNS (a INTEGER PATH 'lax $.a',
                 NESTED PATH 'lax $.bs[*]' COLUMNS (b INTEGER PATH 'lax $.b'),
                 c INTEGER PATH 'lax $.c')) AS t""")
    // Trino preserves declaration order: a, b (the nested block, where
    // it was declared), c — NOT leaves-first (r13 advice)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1, 2, 3)))
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
    // NESTED chains of any depth, siblings at ANY level, siblings
    // that themselves nest, and the PLAN clause are all supported
    // (rounds 13-14); ON ERROR and PLAN-shape mismatches stay loud
    // named rejections
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (x INT PATH '$.x') " +
      "PLAN (p OUTER q)) t")
      .contains("PLAN"))
    // PLAN demands names, full coverage, and unambiguous combinators
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' AS r COLUMNS (x INT PATH '$.x', " +
      "NESTED PATH '$.y[*]' COLUMNS (z INT PATH '$.z')) PLAN (r OUTER y)) t")
      .contains("AS names"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' AS r COLUMNS (x INT PATH '$.x', " +
      "NESTED PATH '$.y[*]' AS y COLUMNS (z INT PATH '$.z'), " +
      "NESTED PATH '$.w[*]' AS w COLUMNS (v INT PATH '$.v')) PLAN (r OUTER y)) t")
      .contains("the plan names 1"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' AS r COLUMNS (x INT PATH '$.x', " +
      "NESTED PATH '$.a[*]' AS a COLUMNS (p INT PATH '$.p'), " +
      "NESTED PATH '$.b[*]' AS b COLUMNS (q INT PATH '$.q'), " +
      "NESTED PATH '$.c[*]' AS c COLUMNS (s INT PATH '$.s')) " +
      "PLAN (r OUTER (a UNION b CROSS c))) t")
      .contains("parenthesize"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' AS r COLUMNS (x INT PATH '$.x', " +
      "NESTED PATH '$.y[*]' AS y COLUMNS (z INT PATH '$.z')) PLAN (r OUTER nope)) t")
      .contains("does not cover path 'y'"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' AS r COLUMNS (x INT PATH '$.x', " +
      "NESTED PATH '$.a[*]' AS dup COLUMNS (p INT PATH '$.p'), " +
      "NESTED PATH '$.b[*]' AS dup COLUMNS (q INT PATH '$.q')) " +
      "PLAN (r OUTER (dup UNION other))) t")
      .contains("duplicate AS path names"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (x INT PATH '$.x') " +
      "ERROR ON ERROR) t")
      .contains("ON ERROR"))
    assert(err("SELECT * FROM d, JSON_TABLE(doc, 'lax $[*]' COLUMNS (x INT PATH '$.x', " +
      "NESTED PATH '$.y' COLUMNS (z INT PATH '$.z'))) t")
      .contains("iterate an array"))
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
