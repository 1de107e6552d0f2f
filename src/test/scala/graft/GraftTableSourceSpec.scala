package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The commit-log-offset streaming source (`format("graft-table")`):
  * offsets are commit versions, batches align with commit boundaries,
  * CDC mode emits the per-commit row-level change feed. Each scenario
  * drains with Trigger.AvailableNow into a collecting sink and checks
  * against the table's own batch surfaces (read / changes).
  */
class GraftTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String) =
    graft.store.GraftTable.create(spark, dir,
      Seq.empty[(Long, String)].toDF("id", "v"))

  private def drainToParquet(root: String, out: String, ckpt: String,
                             options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft-table")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(root).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(240000), "stream did not drain in 240s")
  }

  test("append tail: commit-aligned batches, checkpoint resume emits only new commits") {
    val troot = Files.createTempDirectory("gts_a").resolve("t").toString
    val out = Files.createTempDirectory("gts_a_out").toString
    val ckpt = Files.createTempDirectory("gts_a_ckpt").toString
    val t = mkTable(troot)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))

    drainToParquet(troot, out, ckpt)
    assert(spark.read.parquet(out).orderBy("id").as[(Long, String)].collect().toSeq
      == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // new commit after the first drain: resume must emit ONLY it
    t.append(Seq((4L, "d")).toDF("id", "v"))
    drainToParquet(troot, out, ckpt)
    assert(spark.read.parquet(out).count() == 4)
    assert(spark.read.parquet(out).orderBy("id").as[(Long, String)].collect().toSeq
      == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("append tail refuses a rewrite commit; ignoreChanges re-emits carried rows") {
    val troot = Files.createTempDirectory("gts_r").resolve("t").toString
    val out = Files.createTempDirectory("gts_r_out").toString
    val ckpt = Files.createTempDirectory("gts_r_ckpt").toString
    val t = mkTable(troot)
    // one data file, so the update's rewrite CARRIES the untouched row
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    t.update($"id" === 1L, Map("v" -> lit("a2")))

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainToParquet(troot, out, ckpt)
    }
    assert(e.getCause.getMessage.contains("non-append commit"), e.getCause.getMessage)
    assert(e.getCause.getMessage.contains("cdc"), e.getCause.getMessage)

    // ignoreChanges: the rewrite's files re-emit the carried row (2,b)
    // alongside the updated (1,a2) — Delta's documented at-least-once
    val out2 = Files.createTempDirectory("gts_r_out2").toString
    val ckpt2 = Files.createTempDirectory("gts_r_ckpt2").toString
    drainToParquet(troot, out2, ckpt2, Map("ignoreChanges" -> "true"))
    val got = spark.read.parquet(out2).as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (1L, "a2"), (2L, "b"), (2L, "b")), got)
  }

  test("cdc mode: per-commit change feed matches the batch changes() surface") {
    val troot = Files.createTempDirectory("gts_c").resolve("t").toString
    val out = Files.createTempDirectory("gts_c_out").toString
    val ckpt = Files.createTempDirectory("gts_c_ckpt").toString
    val t = mkTable(troot)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))       // v2
    val updV = t.update($"id" === 1L, Map("v" -> lit("a2")))  // v3
    val delV = t.delete($"id" === 2L)                         // v4

    drainToParquet(troot, out, ckpt, Map("cdc" -> "true"))
    val feed = spark.read.parquet(out)
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(feed == Seq(
      (1L, "a", "delete", updV),
      (1L, "a", "insert", 2L),
      (1L, "a2", "insert", updV),
      (2L, "b", "delete", delV),
      (2L, "b", "insert", 2L)), feed)

    // the whole feed, ignoring version attribution, equals one batch diff
    val batchDiff = t.changes(0, t.currentVersion)
      .as[(Long, String, String)].collect().sorted.toSeq
    // net feed == net diff: cancel per-row insert/delete pairs
    def net(rows: Seq[(Long, String, String)]) =
      rows.groupBy(r => (r._1, r._2)).view.mapValues { g =>
        g.count(_._3 == "insert") - g.count(_._3 == "delete")
      }.filter(_._2 != 0).toMap
    assert(net(feed.map(r => (r._1, r._2, r._3))) == net(batchDiff))
  }

  test("batches crossing addColumn/renameColumn align by field id (no wedge)") {
    // ADVICE r5 (medium): a CDC offset range crossing a schema-evolution
    // commit used to fail the per-commit unionByName — and after the
    // advised restart the checkpointed offset still preceded the
    // evolution, wedging the stream PERMANENTLY. Every per-commit diff
    // (and rate-limited append batch) now aligns to the pinned schema
    // by field id before the union.
    val troot = Files.createTempDirectory("gts_ev").resolve("t").toString
    val t = mkTable(troot)
    t.append(Seq((1L, "a")).toDF("id", "v"))                      // v2 (schema id,v)
    t.addColumn("w", org.apache.spark.sql.types.LongType)         // v3
    t.append(Seq((2L, "b", 20L)).toDF("id", "v", "w"))            // v4
    t.renameColumn("v", "v2")                                     // v5
    t.append(Seq((3L, "c", 30L)).toDF("id", "v2", "w"))           // v6
    // CDC: ONE batch spans both evolution commits; stream starts AFTER
    // them, so pinned = (id, v2, w) and pre-evolution diffs must align
    val out = Files.createTempDirectory("gts_ev_out").toString
    val ckpt = Files.createTempDirectory("gts_ev_ckpt").toString
    drainToParquet(troot, out, ckpt, Map("cdc" -> "true"))
    val feed = spark.read.parquet(out)
      .selectExpr("id", "v2", "w", "_change_type", "_commit_version")
      .as[(Long, String, Option[Long], String, Long)].collect().sorted.toSeq
    assert(feed == Seq(
      (1L, "a", None, "insert", 2L),        // pre-addColumn rows: w NULL, v under the new name
      (2L, "b", Some(20L), "insert", 4L),
      (3L, "c", Some(30L), "insert", 6L)), feed)
    // APPEND mode, rate-limited to one commit per batch: the batch for
    // v2 ends BEFORE the evolution commits (schemaAt(2) = old names)
    val out2 = Files.createTempDirectory("gts_ev_out2").toString
    val ckpt2 = Files.createTempDirectory("gts_ev_ckpt2").toString
    drainToParquet(troot, out2, ckpt2, Map("maxCommitsPerTrigger" -> "1"))
    val rows = spark.read.parquet(out2).selectExpr("id", "v2", "w")
      .as[(Long, String, Option[Long])].collect().sorted.toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(20L)), (3L, "c", Some(30L))), rows)
    // a mid-stream DROP of a streamed column fails loudly — pinned
    // still carries the column, so NULL-filling would fabricate data
    val out3 = Files.createTempDirectory("gts_ev_out3").toString
    val ckpt3 = Files.createTempDirectory("gts_ev_ckpt3").toString
    val q = spark.readStream.format("graft-table").load(troot).writeStream
      .format("parquet").option("path", out3)
      .option("checkpointLocation", ckpt3).start()
    try {
      q.processAllAvailable() // pins (id, v2, w); drains the backlog
      assert(spark.read.parquet(out3).count() == 3)
      t.dropColumn("w")
      t.append(Seq((5L, "e")).toDF("id", "v2"))
      try q.processAllAvailable() catch { case _: Exception => () }
      val err = q.exception.map(_.toString).getOrElse("")
      assert(err.contains("dropped") && err.contains("restart"), err)
    } finally q.stop()
    // the restart hint is TRUTHFUL: a fresh stream on the same
    // checkpoint re-pins without the column and drains past the drop
    drainToParquet(troot, out3, ckpt3)
    assert(spark.read.parquet(out3).select("id").distinct().count() == 4)
  }

  test("CDC replication loop: target converges to the source across arbitrary DML") {
    val aroot = Files.createTempDirectory("gts_rep").resolve("a").toString
    val broot = Files.createTempDirectory("gts_rep").resolve("b").toString
    val ckpt = Files.createTempDirectory("gts_rep_ckpt").toString
    val a = mkTable(aroot)
    val b = mkTable(broot)
    a.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    a.update($"id" === 2L, Map("v" -> lit("b2")))
    a.delete($"id" === 3L)
    a.append(Seq((4L, "d")).toDF("id", "v"))

    def replicate(): Unit = {
      val q = graft.streaming.EventStream.applyCdcGraftTable(
        spark.readStream.format("graft-table").option("cdc", "true").load(aroot),
        b, Seq("id"), ckpt)
      assert(q.awaitTermination(240000), "replication did not drain in 240s")
    }
    def snap(t: graft.store.GraftTable) =
      t.read().orderBy("id").as[(Long, String)].collect().toSeq

    replicate()
    assert(snap(b) == snap(a), s"b=${snap(b)} a=${snap(a)}")
    assert(snap(b) == Seq((1L, "a"), (2L, "b2"), (4L, "d")))

    // more DML on the source; resume from the checkpoint — only the
    // new commits apply, and the target converges again
    a.delete($"id" === 1L)
    a.append(Seq((5L, "e")).toDF("id", "v"))
    a.update($"id" === 4L, Map("v" -> lit("d2")))
    replicate()
    assert(snap(b) == snap(a), s"b=${snap(b)} a=${snap(a)}")
    assert(snap(b) == Seq((2L, "b2"), (4L, "d2"), (5L, "e")))
    // every replication batch is one atomic labeled commit on the target
    assert(b.history.count(_.op.startsWith("stream-cdc:")) >= 2)
  }

  test("startingVersion=latest emits only commits made after stream start") {
    val troot = Files.createTempDirectory("gts_s").resolve("t").toString
    val ckpt = Files.createTempDirectory("gts_s_ckpt").toString
    val t = mkTable(troot)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))

    // running query (default trigger): history invisible, live commit seen
    val buf = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "latest").load(troot)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= b.as[(Long, String)].collect() }; ()
      }.start()
    try {
      q.processAllAvailable()
      assert(buf.isEmpty, buf)
      t.append(Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(buf.toSeq == Seq((3L, "c")), buf)
    } finally q.stop()

    // RESTART catch-up: commits made while the stream was DOWN must
    // drain on resume — the engine's checkpointed offset governs, not a
    // re-resolved 'latest' head (which would withhold them forever)
    t.append(Seq((4L, "d")).toDF("id", "v"))
    val buf2 = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    val q2 = spark.readStream.format("graft-table")
      .option("startingVersion", "latest").load(troot)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        buf2.synchronized { buf2 ++= b.as[(Long, String)].collect() }; ()
      }.start()
    assert(q2.awaitTermination(240000))
    assert(buf2.toSeq == Seq((4L, "d")), buf2)
  }

  test("maxCommitsPerTrigger: catch-up advances one commit per micro-batch") {
    val troot = Files.createTempDirectory("gts_m").resolve("t").toString
    val ckpt = Files.createTempDirectory("gts_m_ckpt").toString
    val t = mkTable(troot)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))

    // Trigger.AvailableNow is the hard case: the source implements
    // SupportsTriggerAvailableNow, so the run drains the WHOLE backlog
    // one commit per micro-batch (a plain V1 source would be wrapped
    // with a one-shot getOffset snapshot and stop after commit 1)
    var batches = 0
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-table")
      .option("maxCommitsPerTrigger", "1").load(troot)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = b.as[(Long, String)].collect()
        rows.synchronized { if (got.nonEmpty) batches += 1; rows ++= got }; ()
      }.start()
    assert(q.awaitTermination(240000), "bounded catch-up did not drain in 240s")
    assert(batches == 3, s"expected 3 single-commit batches, got $batches")
    assert(rows.sorted.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")), rows)
  }
}
