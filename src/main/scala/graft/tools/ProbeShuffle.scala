package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** r15 A/B instrument: run the named coverage queries once and report
  * LOAD-INDEPENDENT execution metrics — total stages, tasks, shuffle
  * write bytes/records, input bytes. Wall-clock A/Bs on this host are
  * noise-bound (multi-minute outside-container load bursts, see
  * SCALE.md); bytes-moved and stage counts are deterministic for a
  * fixed plan, so they discriminate a structural change definitively.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProbeShuffle <query> [query...]
  * Prints one "[probeshuffle] name stages=.. tasks=.. shufMB=.. shufRecs=.. inputMB=.." line each.
  */
object ProbeShuffle {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeShuffle <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    class Acc extends SparkListener {
      @volatile var stages = 0
      @volatile var tasks = 0
      @volatile var shufBytes = 0L
      @volatile var shufRecs = 0L
      @volatile var inputBytes = 0L
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        val m = sc.stageInfo.taskMetrics
        shufBytes += m.shuffleWriteMetrics.bytesWritten
        shufRecs += m.shuffleWriteMetrics.recordsWritten
        inputBytes += m.inputMetrics.bytesRead
      }
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      spark.sparkContext.setJobDescription(s"probeshuffle: $name")
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events are async (the bus is private API): poll until
      // the stage count is stable for two consecutive 300 ms windows
      var last = -1
      while (acc.stages != last) { last = acc.stages; Thread.sleep(300) }
      spark.sparkContext.removeSparkListener(acc)
      println(f"[probeshuffle] $name stages=${acc.stages} tasks=${acc.tasks} " +
        f"shufMB=${acc.shufBytes / 1e6}%.2f shufRecs=${acc.shufRecs} " +
        f"inputMB=${acc.inputBytes / 1e6}%.2f secs=$secs%.2f")
    }
    spark.stop()
  }
}
