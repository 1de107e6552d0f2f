package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine introspection — walden's `system` catalog + Trino web UI
  * surface (`tf/superset/superset.tf:63-68`, `README.md:185,196-203`:
  * node connectivity, running queries, metadata browse). Spark-side:
  * small LocalRelation views over `statusTracker` and `spark.catalog`.
  */
object SystemCatalog {

  /** `system.runtime.nodes` equivalent: executor inventory. */
  def nodes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext.statusTracker.getExecutorInfos.toSeq
      .map(e => (e.host(), e.port(), e.numRunningTasks()))
      .toDF("host", "port", "running_tasks")
  }

  /** `system.runtime.queries` equivalent: active jobs. */
  def queries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val st = spark.sparkContext.statusTracker
    st.getActiveJobIds().toSeq
      .flatMap(id => st.getJobInfo(id))
      .map(j => (j.jobId(), j.status().toString, j.stageIds().mkString(",")))
      .toDF("job_id", "status", "stage_ids")
  }

  /** Metadata browse for BI (`allow_multi_schema_metadata_fetch`):
    * every table in every database with its columns. */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // listTables(db) also returns session temp views (database = null)
    // for EVERY database — attribute those to the session once, not to
    // each database, and resolve their columns by bare name.
    val persistent = spark.catalog.listDatabases().collect().toSeq
      .flatMap { db =>
        spark.catalog.listTables(db.name).collect().toSeq
          .filter(_.database != null)
          .map(t => (db.name, t.name, t.tableType,
            columnsOf(spark, t.database + "." + t.name)))
      }
    val tempViews = spark.catalog.listTables().collect().toSeq
      .filter(_.database == null)
      .map(t => ("<session>", t.name, t.tableType, columnsOf(spark, t.name)))
    (persistent ++ tempViews).toDF("database", "table", "type", "columns")
  }

  private def columnsOf(spark: SparkSession, qualified: String): String =
    try spark.catalog.listColumns(qualified)
      .collect().map(c => s"${c.name}:${c.dataType}").mkString(",")
    catch { case _: Exception => "" }

  /** Register the system views under `system_*` names. */
  def register(spark: SparkSession): Unit = {
    nodes(spark).createOrReplaceTempView("system_nodes")
    queries(spark).createOrReplaceTempView("system_queries")
    tables(spark).createOrReplaceTempView("system_tables")
  }

  /** `ANALYZE TABLE ... COMPUTE STATISTICS` over every named table —
    * feeds Catalyst CBO (SURVEY.md §4: cost-based join reorder). */
  def analyzeAll(spark: SparkSession, tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
}
