package graft.engine

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Hive-metastore-backed catalog smoke — walden's metastore path
  * (`docker/metastore/Dockerfile:6-12` runs a standalone Hive metastore;
  * `tf/test-hive.sh:19-24` drives the DDL cycle through it). Here the
  * same cycle runs with `spark.sql.catalogImplementation=hive` over an
  * embedded Derby metastore (the same Derby Hive itself uses for
  * standalone deployments), proving the engine's DDL surface works
  * against a PERSISTENT external catalog, not just the in-memory one.
  *
  * Runs as its own JVM (see HiveSmokeSpec): `catalogImplementation` is
  * a static conf fixed when the first session's SharedState is built,
  * so the suite-wide in-memory session cannot be switched in place.
  *
  * Phase 2 re-creates the session against the same Derby database and
  * reads the table back — the table definition survives the session,
  * which is the property a metastore exists to provide.
  */
object HiveSmoke {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0)
               else Files.createTempDirectory("graft_hive").toString
    val derbyUrl = s"jdbc:derby:;databaseName=$base/metastore_db;create=true"

    def session(): SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-hive-smoke")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL", derbyUrl)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()

    // ---- phase 1: the tf/test-hive.sh DDL cycle --------------------------
    var spark = session()
    require(spark.conf.get("spark.sql.catalogImplementation") == "hive",
      "session did not come up with the hive catalog")
    spark.sql("DROP TABLE IF EXISTS direct.dim_foo")
    spark.sql("DROP DATABASE IF EXISTS direct")
    // tf/test-hive.sh:21 — CREATE SCHEMA hive.direct WITH (location=...)
    spark.sql(s"CREATE DATABASE direct LOCATION '$base/direct'")
    // tf/test-hive.sh:22-23 — typed CREATE TABLE + INSERT VALUES
    spark.sql("CREATE TABLE direct.dim_foo (key STRING, val BIGINT) USING parquet")
    spark.sql(
      "INSERT INTO direct.dim_foo VALUES ('this', 1), ('is', 2), ('a', 3), ('test', 4)")
    // tf/test-hive.sh:24 — SELECT back
    val rows = spark.sql("SELECT key, val FROM direct.dim_foo ORDER BY val")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(rows == Seq(("this", 1L), ("is", 2L), ("a", 3L), ("test", 4L)), rows.toString)
    // tf/test-hive.sh:27 — physical object check (`mc ls -r` equivalent)
    val dataDir = Paths.get(base, "direct", "dim_foo")
    val hasParquet = {
      val s = Files.walk(dataDir)
      try s.iterator.asScala.exists(_.toString.endsWith(".parquet"))
      finally s.close()
    }
    require(hasParquet, s"no parquet files under $dataDir")
    println(s"HIVE_SMOKE> phase1 rows=${rows.length}")
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- phase 2: metastore persistence across sessions ------------------
    spark = session()
    val back = spark.sql("SELECT sum(val) AS s FROM direct.dim_foo").head().getLong(0)
    require(back == 10L, s"expected sum 10 after metastore reconnect, got $back")
    require(spark.catalog.listTables("direct").collect().map(_.name).contains("dim_foo"))
    println("HIVE_SMOKE> phase2 persistent")
    // cleanup (tf/test-hive.sh:19-20 rerun)
    spark.sql("DROP TABLE direct.dim_foo")
    spark.sql("DROP DATABASE direct")
    println("HIVE_SMOKE> OK")
    spark.stop()
  }
}
