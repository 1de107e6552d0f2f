package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.PatternMatch

/** Streaming row-pattern detection — MATCH_RECOGNIZE semantics over a
  * LIVE event stream (the CEP shape Flink exposes as `CEP.pattern` and
  * Trino has no streaming analogue for), scoped to session windows.
  *
  * Semantics contract: each key's stream is cut into sessions by a
  * `gapMinutes` event-time gap (the [[EventStream.sessionize]] rule);
  * when a session CLOSES — a later event opens the next session, or
  * the watermark times the key out — the session's rows are ordered by
  * event time and run through the SAME backtracking NFA as the batch
  * operator ([[PatternMatch.findMatches]]: one shared matcher, so
  * batch and stream can never drift), with the same AFTER MATCH skip
  * modes. Output is one row per match: key, session start, match
  * number within the session, the match's time span and row count, the
  * per-row classifier sequence, and the value sum over the match —
  * the fixed record streaming funnels/alerts consume. Richer measures
  * are the batch operator's job (join hits back on the time span), not
  * worth carrying generically through a streaming state encoder.
  *
  * Batch parity (asserted in StreamingSpec): for any key, hits equal
  * `PatternMatch.matchPattern` run per (key, session) over the same
  * rows. Note the scope: a pattern can never match ACROSS a session
  * gap — that is the operator's point (streams are unbounded; the
  * session window is what makes per-key matching finite), and the
  * caller picks the gap accordingly.
  *
  * Scale: state per key = the OPEN session's rows (closed sessions
  * emit and leave state immediately; timed-out keys are removed), so
  * memory is O(active keys x open-session length) — the same
  * largest-single-group contract as the batch matcher, now bounded by
  * the session gap instead of the key group. Late rows beyond the
  * watermark are dropped by the watermark operator itself; late rows
  * WITHIN it land in the still-open session and are ordered correctly
  * at close (the close-time sort).
  *
  * Determinism: rows are ordered by (event-time micros, symbol mask,
  * value) at close, so equal-timestamp rows have a stable order given
  * the row multiset; give each key unique timestamps (or an encoded
  * tie-break in `value`) when exact tie order matters.
  */
object PatternStream {

  final case class PatternEvent(key: Long, ts: java.sql.Timestamp,
                                truth: Long, value: Double)
  final case class PatternSessionState(rows: List[(Long, Long, Double)])
  final case class PatternHit(key: Long, session_start_micros: Long,
      match_num: Long, start_micros: Long, end_micros: Long, n_rows: Long,
      classifiers: String, sum_value: Double)

  /** `events` need not be pre-watermarked: the op projects
    * (key, ts, symbol-truth bitmask, value) and watermarks the
    * projected event-time column with the session gap itself. */
  /** `maxSessionRows` bounds per-key state: a key whose events never
    * pause longer than the gap has ONE unbounded session — a real
    * operational hazard on hot keys (bot traffic, a misconfigured
    * producer). Exceeding it fails LOUDLY (like the matcher's
    * backtracking budget) rather than silently splitting the session —
    * a split would fabricate a pattern boundary mid-stream; the fix
    * belongs to the caller (finer key, shorter gap, or upstream
    * sampling). */
  def matchPatternSessions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      symbols: Seq[(String, Column)],
      pattern: String,
      valueCol: Column,
      gapMinutes: Int = 30,
      skip: String = "past last row",
      maxSessionRows: Int = 1000000): Dataset[PatternHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val symNames = symbols.map(_._1)
    require(symNames.nonEmpty && symNames.length <= 62,
      s"matchPatternSessions supports 1..62 symbols (truth rides a Long bitmask), " +
        s"got ${symNames.length}")
    // a silent cast of a string/fractional key to long would NULL or
    // truncate-collide keys and surface as an opaque encoder failure
    // mid-stream — fail fast at construction instead
    events.schema(events.schema.fieldIndex(keyCol)).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"matchPatternSessions key column '$keyCol' must be integral, got " +
          s"${other.simpleString} — hash or dictionary-encode the key upstream")
    }
    val pat = PatternMatch.parse(pattern, symNames)
    val skipMode = PatternMatch.parseSkip(skip, symNames)
    val gapMicros = gapMinutes * 60L * 1000000L
    val nSym = symNames.length
    // one codegen'd projection evaluates every symbol predicate into a
    // bitmask BEFORE the stateful operator — state carries 3 longs +
    // a double per row, never the source columns
    val truthCol = symbols.zipWithIndex.map { case ((_, c), i) =>
      when(c, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

    def closeSession(key: Long, rows: List[(Long, Long, Double)]): Iterator[PatternHit] =
      if (rows.isEmpty) Iterator.empty
      else {
        val sorted = rows.sortBy(r => (r._1, r._2, r._3)).toArray
        val truth = sorted.map(r => Array.tabulate(nSym)(s => ((r._2 >> s) & 1L) == 1L))
        val ms = PatternMatch.findMatches(truth, pat, skipMode)
        val sessionStart = sorted.head._1
        ms.iterator.zipWithIndex.map { case (mt, mi) =>
          var sum = 0.0
          var i = mt.start
          while (i < mt.end) { sum += sorted(i)._3; i += 1 }
          PatternHit(key, sessionStart, mi + 1L,
            sorted(mt.start)._1, sorted(mt.end - 1)._1,
            (mt.end - mt.start).toLong,
            mt.cls.map(ci => if (ci >= 0) symNames(ci) else "?").mkString(","),
            sum)
        }
      }

    // linear merge of two (ts, truth, value)-sorted row lists — the
    // stable tie order matches the previous whole-list sortBy exactly
    // (state rows precede equal incoming rows, as they did when a
    // stable sort kept earlier-appended elements first)
    def merge(a: List[(Long, Long, Double)], b: List[(Long, Long, Double)])
        : List[(Long, Long, Double)] = {
      val out = scala.collection.mutable.ListBuffer[(Long, Long, Double)]()
      var x = a
      var y = b
      val ord = Ordering.Tuple3(Ordering.Long, Ordering.Long, Ordering.Double.TotalOrdering)
      while (x.nonEmpty && y.nonEmpty) {
        if (ord.lteq(x.head, y.head)) { out += x.head; x = x.tail }
        else { out += y.head; y = y.tail }
      }
      out ++= x
      out ++= y
      out.toList
    }

    // sessions in one sorted run: every gap break closes the rows
    // before it; the trailing run stays open in state
    def splitSessions(all: List[(Long, Long, Double)]): List[List[(Long, Long, Double)]] = {
      val out = scala.collection.mutable.ListBuffer[List[(Long, Long, Double)]]()
      var cur = scala.collection.mutable.ListBuffer[(Long, Long, Double)]()
      var prev = Long.MinValue
      all.foreach { r =>
        if (prev != Long.MinValue && r._1 - prev > gapMicros) {
          out += cur.toList; cur = scala.collection.mutable.ListBuffer()
        }
        cur += r
        prev = r._1
      }
      out += cur.toList
      out.toList
    }

    events
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        truthCol.as("truth"), valueCol.cast("double").as("value"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[PatternEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[PatternSessionState, PatternHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[PatternEvent], state: GroupState[PatternSessionState]) =>
          if (state.hasTimedOut) {
            val rows = state.get.rows
            state.remove()
            closeSession(key, rows)
          } else {
            // full microsecond precision (getTime truncates to millis)
            val incoming = it.map(e =>
              (e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L,
                e.truth, e.value)).toList.sortBy(r => (r._1, r._2, r._3))
            // state rows are ALWAYS sorted (the stored open session is a
            // suffix of the previous batch's sorted stream), so each
            // batch sorts only its own rows and MERGES: O(B log B + L)
            // per batch instead of re-sorting the whole open session —
            // the difference between O(L) and O(L log L) for a hot key
            // near the maxSessionRows ceiling (r9 verdict #3). Late
            // arrivals inside the watermark interleave correctly: the
            // merge places them by (ts, truth, value) wherever they land
            // in the open session.
            val all = merge(state.getOption.map(_.rows).getOrElse(Nil), incoming)
            val sessions = splitSessions(all)
            val open = sessions.last
            if (open.length > maxSessionRows) sys.error(
              s"matchPatternSessions: key $key's open session exceeds " +
                s"$maxSessionRows rows with no $gapMinutes-minute gap — " +
                "unbounded per-key state; use a finer key, a shorter gap, " +
                "or sample the key upstream (maxSessionRows raises the cap)")
            state.update(PatternSessionState(open))
            state.setTimeoutTimestamp(open.last._1 / 1000L + gapMinutes * 60L * 1000L)
            sessions.dropRight(1).iterator.flatMap(s => closeSession(key, s))
          }
      }
  }
}
