package graft.tools

import graft.Tables
import graft.engine.GraftSession
import graft.serve.QueryService

/** r14 optimization-round diagnostic: replicate ServeSpec's
  * "service-rate soak" exactly (sf0.001, 100/s pacing, 5% fresh-literal
  * misses, 4 users) but with per-query latency accounting, to find why
  * workers starve at HEAD when r13 passed.
  * Run: runMain graft.tools.ProbeServe [total]
  */
object ProbeServe {
  def main(args: Array[String]): Unit = {
    val total = if (args.nonEmpty) args(0).toInt else 1500
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    Tables.registerAll(spark, sf)
    val svc = new QueryService(spark, workers = 8, cacheTtlSeconds = 300,
      maxTrackedQueries = 1000,
      onUserSession = (s, _) => Tables.registerAll(s, sf))
    val relational =
      "SELECT l_returnflag, SUM(l_quantity) AS q FROM lineitem GROUP BY l_returnflag"
    val dedup = "SELECT COUNT(*) AS n FROM (SELECT md5(text) AS h FROM documents " +
      "GROUP BY md5(text) HAVING COUNT(*) > 1)"
    val pattern = """SELECT COUNT(*) AS n FROM (
        SELECT * FROM (SELECT user_id, ts, event_id, value FROM events
                       WHERE event_type = 'purchase') MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES COUNT(D.*) AS nd ONE ROW PER MATCH
          PATTERN (D+ U)
          DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)))"""
    val repeats = Array(relational, dedup, pattern)
    repeats.foreach(q => require(svc.sql(q).isInstanceOf[svc.Finished], q))

    val submitTs = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val start = System.nanoTime()
    val ids = scala.collection.mutable.ArrayBuffer[Long]()
    val kinds = scala.collection.mutable.ArrayBuffer[String]()
    var maxBacklog = 0
    var i = 0
    while (i < total) {
      val (kind, sql) =
        if (i % 20 == 19) ("miss", s"$relational HAVING SUM(l_quantity) > ${i % 977}")
        else (Seq("rel", "ded", "pat").apply(i % 3), repeats(i % 3))
      val id = svc.submit(sql, user = s"u${i % 4}")
      submitTs.put(id, System.nanoTime())
      ids += id; kinds += kind
      if (i % 100 == 99) {
        val backlog = ids.takeRight(1000)
          .count(id => svc.status(id).exists(s =>
            s == svc.Queued || s == svc.Running))
        maxBacklog = math.max(maxBacklog, backlog)
        println(f"[soak] i=$i backlog=$backlog elapsed=${(System.nanoTime()-start)/1e9}%.1f s")
      }
      val due = start + (i + 1) * 10000000L
      val lag = due - System.nanoTime()
      if (lag > 0) Thread.sleep(lag / 1000000L, (lag % 1000000L).toInt)
      i += 1
    }
    // drain
    val tDrain0 = System.nanoTime()
    while (ids.exists(id => svc.status(id).exists(s =>
        s == svc.Queued || s == svc.Running))) Thread.sleep(50)
    println(f"[soak] drained rest in ${(System.nanoTime()-tDrain0)/1e9}%.1f s; maxBacklog=$maxBacklog")
    // per-kind execution-time stats from the service's Finished.millis
    val byKind = ids.zip(kinds).flatMap { case (id, k) =>
      svc.status(id) match {
        case Some(f: svc.Finished) => Some((k, f.elapsedMs, f.fromCache))
        case other => println(s"[soak] id=$id $k -> $other"); None
      }
    }
    byKind.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (k, xs) =>
      val ms = xs.map(_._2).sorted
      val hits = xs.count(_._3)
      println(f"[stats] $k%-5s n=${xs.size}%5d hits=$hits%5d " +
        f"p50=${ms(ms.size / 2)}%6d ms p90=${ms(ms.size * 9 / 10)}%6d ms max=${ms.last}%6d ms")
    }
    svc.close()
    spark.stop()
  }
}
