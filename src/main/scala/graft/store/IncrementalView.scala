package graft.store

import org.apache.spark.sql.DataFrame

/** Incrementally-maintained derived table: `target = transform(src)`,
  * refreshed by processing ONLY the source rows committed since the
  * last refresh — the materialized-view maintenance loop every
  * curation pipeline hand-rolls (score/filter/tokenize the new crawl
  * batch, never the whole corpus).
  *
  * Contract: `transform` must be ROW-LOCAL and DETERMINISTIC (filter /
  * project / generate — each output row derives from exactly one input
  * row, the same way every time; aggregates would need merge logic,
  * i.e. a different operator). Sources that advanced by APPENDS take
  * the fast path (read only the new files); sources that saw row-level
  * DML / compaction / schema evolution are maintained through the CDC
  * snapshot diff ([[refreshViaDiff]] — cost bounded by CHANGED bytes).
  * The dispatch reads commit-log METADATA only (op names between the
  * synced and current versions — no data pass). `fullRefresh` rebuilds
  * from scratch and re-arms the loop (the escape hatch for
  * nondeterministic transforms).
  *
  * Scale: a refresh reads exactly the files the new commits added
  * (paths from the log), transforms, and appends — cost is O(new
  * data), never O(table). Idempotence: each refresh commit is labeled
  * with the covered source-version range; a crashed-and-replayed
  * refresh finds its label in the target history and skips, the same
  * batch-id dedup the streaming sink uses. The synced watermark lives
  * in a target ref (`__synced_src`), so it is atomic with the target's
  * own commit log and survives reloads.
  */
object IncrementalView {
  private val SyncedRef = "__synced_src"
  private def label(from: Long, to: Long) = s"incr-refresh:$from-$to"

  final case class Refresh(fromVersion: Long, toVersion: Long, appended: Boolean)

  /** Apply new source commits to the target. Returns the covered range;
    * `appended = false` means nothing new (or a replay found its label). */
  def refresh(src: GraftTable, target: GraftTable,
              transform: DataFrame => DataFrame): Refresh = {
    val tLog = GraftTable.logOf(target)
    val last = tLog.getRef(SyncedRef).getOrElse(0L)
    val head = src.currentVersion
    if (head <= last) return Refresh(last, head, appended = false)

    // Crash replay FIRST: a previous refresh starting from `last` may
    // have committed its range and died before moving the watermark.
    // The source may have advanced SINCE that crash, so match on the
    // "from" half of the label and resume from its recorded "to" —
    // matching the full (last, head) label would miss that case and
    // re-append the crashed range's rows. The label can only be the
    // target's most recent refresh commit (watermark is monotone), so
    // scan the target log from the head and stop at the first one —
    // O(commits since that refresh), not O(history).
    val lastRefreshOp = tLog.versions.reverseIterator // already sorted
      .map(v => tLog.read(v).op).find(_.startsWith("incr-refresh:"))
    lastRefreshOp.filter(_.startsWith(s"incr-refresh:$last-"))
      .map(_.stripPrefix(s"incr-refresh:$last-").toLong) match {
      case Some(to) =>
        target.tag(SyncedRef, Some(to))
        return if (to >= head) Refresh(last, to, appended = false)
               else refresh(src, target, transform) // continue from `to`
      case None => ()
    }

    // append-or-diff dispatch from commit METADATA (create counts as
    // the initial append when starting from zero). Read ONLY the
    // in-range commits — a long-lived table's full history is
    // O(commits) files. Append-SHAPED ops add files and remove none
    // ("publish" is WAP's atomic append; streaming sink labels are
    // appendAs); anything else (DML, compaction, schema evolution)
    // takes the CDC-diff path below instead of throwing.
    val srcLog = GraftTable.logOf(src)
    val ops = srcLog.versions.filter(v => v > last && v <= head)
      .map(v => srcLog.read(v).op)
    val nonAppend = ops.filterNot(o =>
      o == "append" || o == "publish" || o.startsWith("stream-append:") ||
        o.startsWith("incr-refresh:") || (last == 0L && o == "create"))
    if (nonAppend.nonEmpty) return refreshViaDiff(src, target, transform, last, head)

    // exactly the files the new commits added (metadata paths)
    val newPaths =
      GraftTable.logOf(src).snapshotFiles(head).map(_.path).toSet --
        GraftTable.logOf(src).snapshotFiles(last).map(_.path).toSet
    if (newPaths.nonEmpty) {
      val sch = src.schemaAt(head)
      val newRows = src.spark.read.schema(sch).format(src.format)
        .load(newPaths.toSeq.map(p => s"${src.root}/$p"): _*)
      // Exactly-once against CONCURRENT refreshers, not just crash
      // replay: two refreshers can both read watermark `last` and both
      // pass the label scan above before either commits. appendAsOnce
      // re-checks for any `incr-refresh:<last>-*` label atomically with
      // the commit (see its doc), so exactly one append lands; the
      // loser adopts the winner's covered range. Matching on the "from"
      // half (not the exact label) also catches a racer that saw a
      // NEWER source head — an exact-label check would double-append
      // the overlap of (last, head) and (last, head').
      val (v, appended) = target.appendAsOnce(label(last, head), transform(newRows),
        op => op.startsWith(s"incr-refresh:$last-"))
      if (!appended) {
        val to = target.commitInfo(v).op.stripPrefix(s"incr-refresh:$last-").toLong
        advanceWatermark(target, tLog, to)
        return if (to >= head) Refresh(last, to, appended = false)
               else refresh(src, target, transform) // continue from `to`
      }
    }
    advanceWatermark(target, tLog, head)
    Refresh(last, head, appended = newPaths.nonEmpty)
  }

  /** DIFF path: the source advanced by row-level DML (or compaction /
    * schema evolution) — maintain the target from the CDC snapshot diff
    * ([[GraftTable.changes]]: file algebra, cost bounded by CHANGED
    * bytes) instead of rebuilding. For a DETERMINISTIC row-local
    * `transform`, `target = transform(src)` is maintained exactly by
    *   delete transform(diff deletes), insert transform(diff inserts)
    * as one atomic multiset replace ([[GraftTable.replaceRowsAs]]):
    * every target row derived from a deleted source row re-derives from
    * the diff's delete side and is removed value-for-value (updates
    * contribute one delete + one insert; compaction diffs to nothing).
    * Determinism is the contract that makes re-derivation match —
    * a transform reading clocks or rand() needs fullRefresh.
    * Idempotence/concurrency: same label + atomic dedup as the append
    * path, so crash replay and racers skip or adopt identically. */
  private def refreshViaDiff(src: GraftTable, target: GraftTable,
                             transform: DataFrame => DataFrame,
                             last: Long, head: Long): Refresh = {
    import org.apache.spark.sql.functions.col
    val diff = src.changes(last, head)
    val ins = transform(diff.filter(col("_change_type") === "insert").drop("_change_type"))
    val del = transform(diff.filter(col("_change_type") === "delete").drop("_change_type"))
    val (v, applied) = target.replaceRowsAs(label(last, head), del, ins,
      op => op.startsWith(s"incr-refresh:$last-"))
    if (!applied) {
      val to = target.commitInfo(v).op.stripPrefix(s"incr-refresh:$last-").toLong
      advanceWatermark(target, GraftTable.logOf(target), to)
      return if (to >= head) Refresh(last, to, appended = false)
             else refresh(src, target, transform)
    }
    advanceWatermark(target, GraftTable.logOf(target), head)
    Refresh(last, head, appended = true)
  }

  /** Advance the synced watermark MONOTONICALLY: a slow racer must not
    * regress the ref below a newer refresh's value. The read-then-set
    * is itself unsynchronized, but a regressed watermark only costs a
    * redundant refresh attempt, which the label dedup then skips —
    * never a duplicated row. */
  private def advanceWatermark(target: GraftTable, tLog: CommitLog, to: Long): Unit =
    if (tLog.getRef(SyncedRef).getOrElse(0L) < to) target.tag(SyncedRef, Some(to))

  /** Rebuild the target from the full source (after DML/compaction on
    * the source broke the incremental contract) and re-arm refresh. */
  def fullRefresh(src: GraftTable, target: GraftTable,
                  transform: DataFrame => DataFrame): Refresh = {
    val head = src.currentVersion
    target.overwrite(transform(src.read(asOfVersion = Some(head))))
    target.tag(SyncedRef, Some(head))
    Refresh(0L, head, appended = true)
  }
}
