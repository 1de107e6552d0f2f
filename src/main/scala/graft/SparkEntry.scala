package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator-coverage entry (SURVEY.md §2) from the
  * per-domain catalogs in graft.operators.
  */
object SparkEntry {

  private def catalogs: Seq[QueryEntry] =
    operators.CoreQueries.entries ++
      operators.DsQueries.entries ++
      operators.FunctionQueries.entries ++
      operators.EventQueries.entries ++
      operators.TextOps.entries ++
      operators.VectorOps.entries ++
      operators.GraphOps.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    functions.GraftFunctions.register(spark)
    queries("q03_shipping_priority")(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    catalogs.flatMap(e => e.oracle.map(o => e.name -> o.trim)).toMap
}
