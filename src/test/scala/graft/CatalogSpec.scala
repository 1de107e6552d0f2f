package graft

import graft.catalog.{Federation, SystemCatalog}

/** Federation (JDBC external catalogs, tested against embedded Derby)
  * + system-catalog introspection views.
  */
class CatalogSpec extends SparkSpec {

  private lazy val derbyUrl = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$dir/extdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE ext_customers (id INT, segment VARCHAR(20))")
    st.execute("INSERT INTO ext_customers VALUES (1, 'BUILDING'), (2, 'AUTOMOBILE'), (3, 'BUILDING')")
    st.close(); conn.close()
    url
  }

  test("JDBC federation: read, register, join with lake tables") {
    val cat = Federation.JdbcCatalog("extpg", derbyUrl)
    val df = Federation.table(spark, cat, "ext_customers")
    assert(df.count() == 3)
    Federation.register(spark, cat, Seq("ext_customers"))
    Tables.registerAll(spark, sf())
    val joined = spark.sql(
      """SELECT e.SEGMENT, COUNT(*) n FROM extpg_ext_customers e
         JOIN customer c ON c.c_mktsegment = e.SEGMENT GROUP BY e.SEGMENT""")
    assert(joined.count() > 0)
  }

  test("federated query passthrough") {
    val cat = Federation.JdbcCatalog("extpg", derbyUrl)
    val one = Federation.query(spark, cat,
      "SELECT COUNT(*) AS n FROM ext_customers WHERE segment = 'BUILDING'")
    assert(one.collect().head.get(0).toString == "2")
  }

  test("system catalog views") {
    SystemCatalog.register(spark)
    assert(spark.table("system_nodes").collect().nonEmpty)
    assert(spark.table("system_tables").columns.toSeq ==
      Seq("database", "table", "type", "columns"))
    // active queries view is valid (usually empty between jobs)
    assert(spark.table("system_queries").columns.length == 3)
  }

  test("ANALYZE feeds CBO") {
    Tables.registerAll(spark, sf())
    spark.sql("DROP TABLE IF EXISTS analyzed_region")
    spark.sql("CREATE TABLE analyzed_region USING parquet AS SELECT * FROM region")
    SystemCatalog.analyzeAll(spark, Seq("analyzed_region"))
    val stats = spark.sql("DESCRIBE EXTENDED analyzed_region")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(stats.contains("Statistics"), stats)
    spark.sql("DROP TABLE analyzed_region")
  }
}
