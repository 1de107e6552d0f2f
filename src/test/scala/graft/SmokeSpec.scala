package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** t1 smoke: faithful port of the reference's only automated test
  * (walden `tf/test-hive.sh:4-30`) — schema-with-location lifecycle,
  * typed CREATE TABLE, INSERT VALUES, SELECT back, assert the physical
  * columnar files exist under the schema location, then drop and
  * assert cleanup. `mc`-level object checks become filesystem asserts.
  */
class SmokeSpec extends SparkSpec {

  private def listFiles(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Seq.empty
    else Files.walk(p).iterator.asScala.filter(Files.isRegularFile(_)).toSeq

  test("test-hive.sh parity: schema -> table -> insert -> select -> files -> drop") {
    val loc = Files.createTempDirectory("graft_direct").toString
    // tf/test-hive.sh:19-20 — drop leftovers
    spark.sql("DROP TABLE IF EXISTS direct.dim_foo")
    spark.sql("DROP DATABASE IF EXISTS direct")
    // tf/test-hive.sh:21 — CREATE SCHEMA hive.direct WITH (location='s3a://direct/')
    spark.sql(s"CREATE DATABASE direct LOCATION '$loc'")
    assert(spark.catalog.databaseExists("direct"))
    // tf/test-hive.sh:22 — CREATE TABLE direct.dim_foo (key VARCHAR, val BIGINT)
    spark.sql("CREATE TABLE direct.dim_foo (key STRING, val BIGINT) USING parquet")
    // tf/test-hive.sh:23 — INSERT 4 rows
    spark.sql(
      "INSERT INTO direct.dim_foo VALUES ('a', 1), ('b', 2), ('c', 3), ('d', 4)")
    // tf/test-hive.sh:24 — SELECT key, val FROM direct.dim_foo
    val rows = spark.sql("SELECT key, val FROM direct.dim_foo ORDER BY key")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
    // tf/test-hive.sh:27 — `mc ls -r` physical-object check
    val files = listFiles(java.nio.file.Paths.get(loc, "dim_foo"))
    assert(files.exists(_.toString.endsWith(".parquet")), s"no parquet files under $loc/dim_foo")
    // SHOW SCHEMAS / DESCRIBE walkthrough (README.md:110-117, :413)
    assert(spark.sql("SHOW DATABASES").collect().map(_.getString(0)).contains("direct"))
    val cols = spark.sql("DESCRIBE TABLE direct.dim_foo")
      .collect().map(_.getString(0)).filterNot(_.startsWith("#"))
    assert(cols.contains("key") && cols.contains("val"))
    // cleanup (tf/test-hive.sh:19-20 rerun + README.md:153-161)
    spark.sql("DROP TABLE direct.dim_foo")
    spark.sql("DROP DATABASE direct")
    assert(!spark.catalog.databaseExists("direct"))
  }

  test("CTAS and CVAS (SQL Lab allow_ctas/allow_cvas parity)") {
    val loc = Files.createTempDirectory("graft_ctas").toString
    spark.sql("DROP TABLE IF EXISTS ctas_db.top_regions")
    spark.sql("DROP DATABASE IF EXISTS ctas_db")
    spark.sql(s"CREATE DATABASE ctas_db LOCATION '$loc'")
    Tables.registerAll(spark, sf())
    spark.sql(
      """CREATE TABLE ctas_db.top_regions USING parquet AS
         SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 3""")
    assert(spark.table("ctas_db.top_regions").count() == 3)
    spark.sql(
      "CREATE OR REPLACE TEMP VIEW big_orders AS SELECT * FROM orders WHERE o_totalprice > 100000")
    assert(spark.table("big_orders").count() > 0)
    spark.sql("DROP TABLE ctas_db.top_regions")
    spark.sql("DROP DATABASE ctas_db")
  }

  test("CSV upload to a table (Superset schemas_allowed_for_csv_upload path)") {
    val dir = Files.createTempDirectory("graft_csv")
    java.nio.file.Files.writeString(dir.resolve("up.csv"),
      "k,val\nx,1\ny,2\nz,3\n")
    spark.sql("DROP TABLE IF EXISTS csv_upload")
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir.toString).write.saveAsTable("csv_upload")
    assert(spark.table("csv_upload").count() == 3)
    assert(spark.sql("SELECT sum(val) FROM csv_upload").collect().head.getLong(0) == 6L)
    spark.sql("DROP TABLE csv_upload")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
