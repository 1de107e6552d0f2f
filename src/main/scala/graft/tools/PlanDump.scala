package graft.tools

/** Optimization-round tooling: dump `.explain("formatted")` for every
  * (or a restricted set of) coverage queries to one file per query.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [suffix] [query ...]
  *   writes <outDir>/<name>_<suffix>.txt   (suffix defaults to "plan")
  *
  * SPARK_GRAFT_SF_DIR selects the data directory (default sf0.1), same
  * contract as Bench, so the plans match what the bench times (AQE
  * initial plans: `isFinalPlan=false` — the shape assertions we make
  * from these files are about Exchange count / join strategy / pushed
  * filters, all visible pre-execution).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "plan"
    val only = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    System.setProperty("graft.verify.sfdir", sfDir)
    val spark = graft.engine.GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
