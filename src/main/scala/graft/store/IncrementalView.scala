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
  * The dispatch reads commit-log METADATA only (file add/remove shapes
  * between the synced and current versions — no data pass).
  * `fullRefresh` rebuilds from scratch and re-arms the loop (the
  * escape hatch for nondeterministic transforms).
  *
  * Scale: a refresh reads exactly the files the new commits added
  * (paths from the log), transforms, and appends — cost is O(new
  * data), never O(table). Idempotence: each refresh commit is labeled
  * with the covered source-version range; ranges are CONTIGUOUS from 0
  * (each refresh starts at the watermark the previous one advanced),
  * so "some refresh already covered past `last`" is equivalent to "the
  * NEWEST refresh label's upper bound exceeds `last`" — the O(1)
  * overlap rule both the replay scan and the store's atomic label
  * dedup use. The synced watermark lives in a target ref
  * (`__synced_src`), atomic with the target's own commit log.
  */
object IncrementalView {
  private val SyncedRef = "__synced_src"
  private val LabelPrefix = "incr-refresh:"
  private def label(from: Long, to: Long) = s"$LabelPrefix$from-$to"

  private def isRefreshLabel(op: String): Boolean = op.startsWith(LabelPrefix)

  /** Upper bound of a refresh label's covered range ("incr-refresh:F-T" -> T). */
  private def labelTo(op: String): Long =
    op.stripPrefix(LabelPrefix).split('-').last.toLong

  final case class Refresh(fromVersion: Long, toVersion: Long, appended: Boolean)

  /** Apply new source commits to the target. Returns the covered range;
    * `appended = false` means nothing new (or a replay found its label). */
  def refresh(src: GraftTable, target: GraftTable,
              transform: DataFrame => DataFrame): Refresh = {
    val tLog = GraftTable.logOf(target)
    val last = tLog.getRef(SyncedRef).getOrElse(0L)
    val head = src.currentVersion
    if (head <= last) return Refresh(last, head, appended = false)

    // Replay/racer adoption FIRST: a refresh may have committed its
    // range and died before moving the watermark (crash), or another
    // refresher may have advanced past our stale watermark read. Both
    // reduce to the overlap rule: the newest refresh label's `to`
    // exceeding `last` means the range from `last` is (partly) covered
    // — adopt its bound and continue from there. Scanning stops at the
    // FIRST refresh label from the head: O(commits since the last
    // refresh), and sufficient because ranges are contiguous (class
    // doc), so the newest label always carries the maximal `to`.
    val newestTo = tLog.versions.reverseIterator
      .map(v => tLog.read(v).op).find(isRefreshLabel).map(labelTo)
    newestTo.filter(_ > last) match {
      case Some(to) => return adopt(src, target, transform, last, head, to)
      case None => ()
    }

    // Append-or-diff dispatch from commit METADATA — the in-range
    // commits' file shapes, never op-name conventions: a commit is
    // append-shaped iff it removes nothing, is not a snapshot reset
    // ("overwrite"/"create" carry empty `removed` but clear the file
    // set in log replay), and did not change the schema. This matters
    // for CHAINED views: a mid-tier diff refresh commits an
    // `incr-refresh:` label WITH removed files; classifying labels as
    // appends by name would make the downstream view re-append every
    // surviving row of the rewritten victims. DML / compaction /
    // rollbacks / schema evolution take the CDC-diff path below
    // instead of throwing.
    val srcLog = GraftTable.logOf(src)
    val inRange = srcLog.versions.filter(v => v > last && v <= head).map(srcLog.read)
    val schemaChanged = last > 0L &&
      srcLog.schemaJsonAt(last) != srcLog.schemaJsonAt(head)
    val appendShaped = !schemaChanged && inRange.forall(c =>
      (c.removed.isEmpty && c.op != "overwrite" && c.op != "create") ||
        (last == 0L && c.op == "create"))
    if (!appendShaped) return refreshViaDiff(src, target, transform, last, head)

    // exactly the files the new commits added (metadata paths)
    val newPaths =
      srcLog.snapshotFiles(head).map(_.path).toSet --
        srcLog.snapshotFiles(last).map(_.path).toSet
    if (newPaths.nonEmpty) {
      val sch = src.schemaAt(head)
      val newRows = src.spark.read.schema(sch).format(src.format)
        .load(newPaths.toSeq.map(p => s"${src.root}/$p"): _*)
      // Exactly-once against CONCURRENT refreshers, not just crash
      // replay: two refreshers can both read watermark `last` and both
      // pass the scan above before either commits. The store re-checks
      // the overlap rule atomically with the commit (appendAsOnce →
      // commitOnce), so exactly one lands; the loser adopts the
      // winner's covered bound.
      val (v, appended) = target.appendAsOnce(label(last, head), transform(newRows),
        isRefreshLabel, op => labelTo(op) > last)
      if (!appended)
        return adopt(src, target, transform, last, head, labelTo(target.commitInfo(v).op))
    }
    advanceWatermark(target, tLog, head)
    Refresh(last, head, appended = newPaths.nonEmpty)
  }

  /** A refresh covering past `last` already landed (crash replay or a
    * racing refresher won): advance the watermark to its bound and
    * either finish or continue from there. */
  private def adopt(src: GraftTable, target: GraftTable,
                    transform: DataFrame => DataFrame,
                    last: Long, head: Long, to: Long): Refresh = {
    advanceWatermark(target, GraftTable.logOf(target), to)
    if (to >= head) Refresh(last, to, appended = false)
    else refresh(src, target, transform) // continue from `to`
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
    * `last == 0` is the base case: changes(0, head) diffs against the
    * empty pre-create snapshot, so the whole source arrives as inserts.
    * Idempotence/concurrency: same label + atomic overlap dedup as the
    * append path, so crash replay and racers skip or adopt identically. */
  private def refreshViaDiff(src: GraftTable, target: GraftTable,
                             transform: DataFrame => DataFrame,
                             last: Long, head: Long): Refresh = {
    import org.apache.spark.sql.functions.col
    val diff = src.changes(last, head)
    val ins = transform(diff.filter(col("_change_type") === "insert").drop("_change_type"))
    val del = transform(diff.filter(col("_change_type") === "delete").drop("_change_type"))
    val (v, applied) = target.replaceRowsAs(label(last, head), del, ins,
      isRefreshLabel, op => labelTo(op) > last)
    if (!applied)
      return adopt(src, target, transform, last, head, labelTo(target.commitInfo(v).op))
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

  /** Rebuild the target from the full source and re-arm refresh — the
    * escape hatch for nondeterministic transforms (the diff path
    * handles deterministic ones incrementally). */
  def fullRefresh(src: GraftTable, target: GraftTable,
                  transform: DataFrame => DataFrame): Refresh = {
    val head = src.currentVersion
    target.overwrite(transform(src.read(asOfVersion = Some(head))))
    target.tag(SyncedRef, Some(head))
    Refresh(0L, head, appended = true)
  }
}
