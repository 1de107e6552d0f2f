package graft.catalog

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-DBMS federation — walden's "add a connector .properties
  * file and query postgres through Trino" path (`README.md:397-412`,
  * `trino_extra_catalogs` `tf/variables.tf:238-251`), re-expressed as
  * Spark's built-in JDBC source registered under a catalog-like
  * namespace of temp views.
  *
  * Scale notes: `partitionColumn`/`numPartitions` shard the remote
  * read across executors (Trino's split generation equivalent);
  * predicates on the view push down to the remote DB via the JDBC
  * source's filter pushdown.
  */
object Federation {

  final case class JdbcCatalog(
      name: String,
      url: String,
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None)

  private def props(c: JdbcCatalog): Properties = {
    val p = new Properties()
    c.user.foreach(p.setProperty("user", _))
    c.password.foreach(p.setProperty("password", _))
    c.driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Read one remote table (optionally partitioned for parallel pull). */
  def table(spark: SparkSession, c: JdbcCatalog, table: String,
            partitionColumn: Option[String] = None,
            lowerBound: Long = 0, upperBound: Long = 1, numPartitions: Int = 1): DataFrame =
    partitionColumn match {
      case Some(col) =>
        spark.read.jdbc(c.url, table, col, lowerBound, upperBound, numPartitions, props(c))
      case None => spark.read.jdbc(c.url, table, props(c))
    }

  /** Register remote tables as `<catalog>_<table>` temp views so SQL
    * can join them with lake tables (walden's cross-catalog query).
    * Remote names are typically schema-qualified (`public.users`);
    * temp-view names cannot contain dots, so non-identifier chars map
    * to `_` (`pg_public_users`). */
  def register(spark: SparkSession, c: JdbcCatalog, tables: Seq[String]): Unit =
    tables.foreach { t =>
      val viewName = s"${c.name}_${t.toLowerCase}".replaceAll("[^a-z0-9_]", "_")
      table(spark, c, t).createOrReplaceTempView(viewName)
    }

  /** Push an arbitrary query to the remote engine (Trino's
    * `query` passthrough table function equivalent). */
  def query(spark: SparkSession, c: JdbcCatalog, sql: String): DataFrame =
    spark.read.jdbc(c.url, s"($sql) AS pushed", props(c))
}
