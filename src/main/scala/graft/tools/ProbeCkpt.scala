package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.GraftSession

/** r14 optimization probe: does localCheckpoint() preserve hash
  * partitioning under AQE, i.e. does a subsequent join/groupBy on the
  * same key skip the exchange on the checkpointed side? Drives the
  * t30/t14 iterative-op design (per-round shuffle of loop-invariant
  * relations). Tries: (a) repartition(col) [AQE-coalescible], (b)
  * repartition(N, col) [exempt from AQE coalescing].
  */
object ProbeCkpt {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(0, 100000, 1, 8).toDF("k")
      .withColumn("v", col("k") % 97)
    val small = spark.range(0, 1000, 1, 4).toDF("k").withColumn("r", col("k") * 2)

    def audit(name: String, ck: org.apache.spark.sql.DataFrame): Unit = {
      println(s"== $name: ckpt partitioning = " +
        ck.queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.LogicalRDD => r.outputPartitioning
        })
      val j = ck.join(small, "k")
      val plan = j.queryExecution.executedPlan.toString
      val exOnCk = plan.linesIterator.count(_.contains("Exchange hashpartitioning(k#"))
      println(s"   join plan exchanges-on-k: $exOnCk")
      println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan ExistingRDD")).map(_.trim).mkString("   ", "\n   ", ""))
    }
    audit("repartition(col)", df.repartition(col("k")).localCheckpoint())
    audit("repartition(8, col)", df.repartition(8, col("k")).localCheckpoint())
    spark.stop()
  }
}
