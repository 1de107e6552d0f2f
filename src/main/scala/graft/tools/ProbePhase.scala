package graft.tools

import graft.Tables
import graft.engine.GraftSession

/** r14 diagnostic: where did the per-statement 3x go? Times each phase
  * of the spark.sql path for the ServeSpec soak queries: dialect
  * rewrite, parse+analyze (spark.sql), optimize, execute (collect).
  * Run: runMain graft.tools.ProbePhase
  */
object ProbePhase {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val relational =
      "SELECT l_returnflag, SUM(l_quantity) AS q FROM lineitem GROUP BY l_returnflag"
    val pattern = """SELECT COUNT(*) AS n FROM (
        SELECT * FROM (SELECT user_id, ts, event_id, value FROM events
                       WHERE event_type = 'purchase') MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES COUNT(D.*) AS nd ONE ROW PER MATCH
          PATTERN (D+ U)
          DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)))"""
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e6, a)
    }
    for (r <- 1 to 6; (name, q) <- Seq("rel" -> relational, "pat" -> pattern)) {
      val (tRw, rw) = time(graft.sql.TrinoDialect.rewrite(q))
      val (tSql, df) = time(spark.sql(q))
      val (tOpt, _) = time(df.queryExecution.optimizedPlan)
      val (tCanon, _) = time(df.queryExecution.optimizedPlan.canonicalized.toString)
      val (tExec, _) = time(df.collect())
      println(f"[phase$r] $name%-4s rewrite=$tRw%7.1f sql=$tSql%7.1f opt=$tOpt%7.1f " +
        f"canon=$tCanon%7.1f exec=$tExec%7.1f ms (rwLen=${rw.length})")
    }
    spark.stop()
  }
}
