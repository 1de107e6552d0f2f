package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.{GraftTable, IncrementalView}

/** Incremental materialized view: refresh processes only new commits,
  * matches a full recompute, is idempotent under replay, and refuses a
  * source that advanced by non-append ops.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(name).resolve("t").toString

  // row-local transform: keep even ids, derive a column
  private val xf: DataFrame => DataFrame =
    df => df.filter(col("id") % 2 === 0).selectExpr("id", "v", "length(v) AS n")

  test("refresh == full recompute, processing only the new commits") {
    val src = GraftTable.create(spark, fresh("iv_src"),
      Seq((1L, "a"), (2L, "bb")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt"),
      xf(src.read().limit(0))) // schema-pinning empty create

    val r1 = IncrementalView.refresh(src, target, xf)
    assert(r1.appended && r1.fromVersion == 0)
    assert(target.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L))

    src.append(Seq((3L, "ccc"), (4L, "dddd")).toDF("id", "v"))
    src.append(Seq((6L, "e")).toDF("id", "v"))
    val r2 = IncrementalView.refresh(src, target, xf)
    assert(r2.appended)
    // matches the from-scratch recompute
    val want = xf(src.read()).orderBy("id").collect().toSeq
    assert(target.read().orderBy("id").collect().toSeq == want)
    // and it really was incremental: one labeled commit per refresh
    val incr = target.history.filter(_.op.startsWith("incr-refresh:"))
    assert(incr.size == 2, target.history.map(_.op))

    // no new source commits -> no-op
    val r3 = IncrementalView.refresh(src, target, xf)
    assert(!r3.appended)
    assert(target.read().orderBy("id").collect().toSeq == want)
  }

  test("source DELETE maintains the target through the CDC diff path") {
    val src = GraftTable.create(spark, fresh("iv_src2"),
      Seq((1L, "a"), (2L, "bb"), (4L, "cccc")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt2"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf)
    assert(target.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))

    // row-level DML on the source: the refresh must apply the diff, not
    // throw and not rebuild — exactly one replace commit, O(changed)
    src.delete(col("id") === 2L)
    val r = IncrementalView.refresh(src, target, xf)
    assert(r.appended)
    assert(target.read().select("id").as[Long].collect().toSeq == Seq(4L))
    assert(target.history.count(_.op.startsWith("incr-refresh:")) == 2,
      target.history.map(_.op))
    // equals the from-scratch recompute
    assert(target.read().orderBy("id").collect().toSeq
      == xf(src.read()).orderBy("id").collect().toSeq)

    // the loop stays armed: appends keep flowing after the diff refresh
    src.append(Seq((8L, "x")).toDF("id", "v"))
    IncrementalView.refresh(src, target, xf)
    assert(target.read().select("id").as[Long].collect().sorted.toSeq == Seq(4L, 8L))
  }

  test("source UPDATE + compaction flow through the diff path; replay skips") {
    val src = GraftTable.create(spark, fresh("iv_src7"),
      Seq((2L, "a"), (4L, "bb"), (6L, "ccc")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt7"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf)
    // update = delete+insert in the diff; compaction diffs to nothing
    src.update(col("id") === 4L, Map("v" -> lit("BBBB")))
    src.compact(numFiles = Some(1))
    val r = IncrementalView.refresh(src, target, xf)
    assert(r.appended)
    val want = xf(src.read()).orderBy("id").collect().toSeq
    assert(target.read().orderBy("id").collect().toSeq == want)
    assert(target.read().filter(col("id") === 4L).select("n").as[Int].head() == 4)
    // crash replay of the diff refresh: rewind the watermark — the
    // labeled replace is found and skipped, rows unchanged
    target.tag("__synced_src", Some(1L))
    val r2 = IncrementalView.refresh(src, target, xf)
    assert(!r2.appended)
    assert(target.read().orderBy("id").collect().toSeq == want)
  }

  test("chained views: a mid-tier diff refresh does not duplicate downstream") {
    // code-review r5 finding: diff refreshes commit incr-refresh labels
    // WITH removed files; the downstream dispatch must classify by
    // commit shape (removed.isEmpty), not by op name, or it re-appends
    // every surviving row of the rewritten victims
    val src = GraftTable.create(spark, fresh("iv_src9"),
      Seq((2L, "a"), (4L, "bb"), (6L, "ccc")).toDF("id", "v"))
    val keep: DataFrame => DataFrame = df => df // identity: rows flow through
    val mid = GraftTable.create(spark, fresh("iv_mid9"), src.read().limit(0))
    val tgt = GraftTable.create(spark, fresh("iv_tgt9"), xf(mid.read().limit(0)))
    IncrementalView.refresh(src, mid, keep)
    IncrementalView.refresh(mid, tgt, xf)
    assert(tgt.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L, 6L))
    // DML on src -> mid takes the diff path (its label commit removes files)
    src.delete(col("id") === 4L)
    IncrementalView.refresh(src, mid, keep)
    assert(mid.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 6L))
    // tgt's refresh over mid must ALSO take the diff path — and agree
    // with the from-scratch recompute (no duplicated survivors)
    IncrementalView.refresh(mid, tgt, xf)
    val got = tgt.read().select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 6L), got)
  }

  test("first refresh over a source whose history already has DML") {
    // code-review r5 finding: last == 0 with non-append history used to
    // crash in changes(0, head); it must flow as the all-inserts base case
    val src = GraftTable.create(spark, fresh("iv_src10"),
      Seq((2L, "a"), (4L, "bb")).toDF("id", "v"))
    src.delete(col("id") === 4L)
    src.append(Seq((6L, "ccc")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt10"), xf(src.read().limit(0)))
    val r = IncrementalView.refresh(src, target, xf)
    assert(r.appended && r.fromVersion == 0)
    assert(target.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 6L))
  }

  test("source schema evolution routes to the diff path, not a confusing append failure") {
    val src = GraftTable.create(spark, fresh("iv_src11"),
      Seq((2L, "a")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt11"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf)
    // rename v -> w, then append under the new schema; the transform
    // still reads 'v', so the refresh must fail with the TRANSFORM's
    // clear analysis error (diff path), not the append path's internal
    // 'unknown column w' alignment dead-end
    src.renameColumn("v", "w")
    src.append(Seq((4L, "bb")).toDF("id", "w"))
    val e = intercept[Exception](IncrementalView.refresh(src, target, xf))
    // the analysis error names the missing column distinctly (backtick
    // form) — a bare contains("v") would match almost any message
    assert(e.getMessage.contains("`v`"), e.getMessage)
    // a schema-aware transform flows through the diff path fine
    val xf2: DataFrame => DataFrame =
      df => df.filter(col("id") % 2 === 0).selectExpr("id", "w AS v", "length(w) AS n")
    val r = IncrementalView.refresh(src, target, xf2)
    assert(r.appended)
    assert(target.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("nondeterministic transform fails loudly on the diff path (no phantom rows)") {
    val src = GraftTable.create(spark, fresh("iv_src12"),
      Seq((2L, "a"), (4L, "bb")).toDF("id", "v"))
    // rand() makes re-derivation never match what was written
    val bad: DataFrame => DataFrame =
      df => df.selectExpr("id", "v", "CAST(rand() * 1e9 AS INT) AS n")
    val target = GraftTable.create(spark, fresh("iv_tgt12"), bad(src.read().limit(0)))
    IncrementalView.refresh(src, target, bad)
    src.delete(col("id") === 2L)
    val e = intercept[IllegalStateException](IncrementalView.refresh(src, target, bad))
    assert(e.getMessage.contains("fullRefresh"), e.getMessage)
    // nothing was committed by the failed refresh
    assert(target.read().count() == 2)
    // and fullRefresh recovers
    IncrementalView.fullRefresh(src, target, bad)
    assert(target.read().select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("fullRefresh remains the escape hatch and re-arms the loop") {
    val src = GraftTable.create(spark, fresh("iv_src8"),
      Seq((1L, "a"), (2L, "bb")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt8"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf)
    src.delete(col("id") === 2L)
    val r = IncrementalView.fullRefresh(src, target, xf)
    assert(r.appended)
    assert(target.read().count() == 0)
    src.append(Seq((8L, "x")).toDF("id", "v"))
    IncrementalView.refresh(src, target, xf)
    assert(target.read().select("id").as[Long].collect().toSeq == Seq(8L))
  }

  test("crashed refresh replay: labeled commit found, no double-append") {
    val src = GraftTable.create(spark, fresh("iv_src3"),
      Seq((2L, "a")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt3"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf)
    src.append(Seq((4L, "bb")).toDF("id", "v"))
    IncrementalView.refresh(src, target, xf)
    // simulate the crash window: rewind the watermark ref as if the
    // previous refresh died after committing but before tagging
    target.tag("__synced_src", Some(1L))
    val r = IncrementalView.refresh(src, target, xf)
    assert(!r.appended, "replay must find its label and skip")
    assert(target.read().count() == 2)
  }

  test("WAP publishes are append-shaped: refresh stays incremental over them") {
    val src = GraftTable.create(spark, fresh("iv_src5"),
      Seq((2L, "a")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt5"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf)
    val staged = src.stageAppend(Seq((4L, "bb")).toDF("id", "v"))
    src.publishStaged(Seq(staged)) // op = "publish"
    val r = IncrementalView.refresh(src, target, xf)
    assert(r.appended, "publish must refresh incrementally, not throw")
    assert(target.read().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("concurrent refreshers over the same range: exactly one append lands") {
    val src = GraftTable.create(spark, fresh("iv_src6"),
      Seq((2L, "a")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt6"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf) // covers 0-1, watermark 1
    src.append(Seq((4L, "bb"), (6L, "c")).toDF("id", "v")) // v2
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // all racers read watermark 1 and try to cover 1-2; the label dedup
    // is atomic with the commit (GraftTable.appendAsOnce), so exactly
    // one appends and the rest adopt its range — no duplicated rows
    val racers = (0 until 4).map(_ => Future(IncrementalView.refresh(src, target, xf)))
    val rs = Await.result(Future.sequence(racers), 120.seconds)
    assert(rs.count(_.appended) == 1, rs)
    val got = target.read().select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L, 6L), got)
    assert(target.history.count(_.op == "incr-refresh:1-2") == 1, target.history.map(_.op))
  }

  test("crashed refresh + source advanced since: resume from the label's bound, no duplicates") {
    val src = GraftTable.create(spark, fresh("iv_src4"),
      Seq((2L, "a")).toDF("id", "v"))
    val target = GraftTable.create(spark, fresh("iv_tgt4"), xf(src.read().limit(0)))
    IncrementalView.refresh(src, target, xf)              // covers 0-1, watermark 1
    src.append(Seq((4L, "bb")).toDF("id", "v"))           // v2
    IncrementalView.refresh(src, target, xf)              // covers 1-2, watermark 2
    // crash: the 1-2 refresh committed but the watermark says 1...
    target.tag("__synced_src", Some(1L))
    // ...and the source ADVANCED after the crash
    src.append(Seq((6L, "ccc")).toDF("id", "v"))          // v3
    val r = IncrementalView.refresh(src, target, xf)
    assert(r.toVersion == 3 && r.appended)
    // the crashed range's rows appear ONCE; the post-crash commit flows
    val got = target.read().select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L, 6L), got)
  }
}
