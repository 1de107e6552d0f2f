package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-pattern matching (the MATCH_RECOGNIZE surface pinned by the
  * reference's Trino 468 engine, `docker/devserver/Dockerfile:14`):
  * regular expressions over partitioned, ordered row streams, with
  * per-symbol boolean predicates and per-match measures.
  *
  * Implemented subset (the commonly used core of SQL:2016 row pattern
  * recognition): ONE ROW PER MATCH and ALL ROWS PER MATCH (OMIT EMPTY
  * MATCHES; see [[matchPatternAllRows]]), AFTER MATCH SKIP PAST LAST ROW,
  * greedy quantifiers, patterns over symbols with concatenation,
  * alternation `|`, grouping `(..)`, and quantifiers `* + ? {n} {n,}
  * {n,m}`. DEFINE predicates are per-row [[Column]] expressions;
  * navigation (PREV/NEXT) is expressed Spark-first by precomputing
  * lag/lead window columns before matching — the predicate then reads
  * an ordinary column, which keeps symbol evaluation inside
  * whole-stage codegen.
  *
  * Scale design: symbol predicates are evaluated as codegen'd boolean
  * columns in a narrow projection; rows then shuffle ONCE on the
  * partition keys and sort within partitions (sort-based exchange —
  * spillable, no hash map of groups), and the matcher streams the
  * sorted partition holding only the CURRENT key group in memory.
  * Memory bound = largest single key group, the same contract as any
  * per-key sequential scan (and Trino's own matcher); at 100 TB the
  * partition key is fine-grained (user, symbol, session), so groups
  * stay small while partitions stream.
  *
  * The matcher itself is a backtracking regex engine over the group's
  * symbol-truth matrix: leftmost match wins, quantifiers prefer more
  * (greedy), and each matched row is classified by the symbol the
  * winning path assigned — classifier-aware measures (FIRST/LAST/
  * COUNT/MIN/MAX/SUM per symbol) read that assignment.
  */
object PatternMatch {

  // ---- pattern AST + parser ------------------------------------------

  private[graft] sealed trait Pat
  private[graft] final case class Sym(idx: Int) extends Pat
  private[graft] final case class Cat(ps: List[Pat]) extends Pat
  private[graft] final case class Alt(ps: List[Pat]) extends Pat
  private[graft] final case class Rep(p: Pat, min: Int, max: Int) extends Pat // max -1 = unbounded
  /** `^` / `$` (round 10): partition start/end anchors — consume
    * nothing, admit only at position 0 / one-past-last. */
  private[graft] final case class Anchor(atStart: Boolean) extends Pat
  /** `{- p -}` (round 10): exclusion — matches exactly like `p`, but
    * the rows it consumes are EXCLUDED from ALL ROWS output (they
    * still classify and feed measures — SQL:2016 output suppression
    * only). */
  private[graft] final case class Excl(p: Pat) extends Pat

  /** Parse a pattern like `"A B+ (C | D){1,3} E?"` against the symbol
    * name list. Fails fast on unknown symbols or syntax errors. */
  private[graft] def parse(pattern: String, symbols: Seq[String]): Pat = {
    val symIdx = symbols.zipWithIndex.toMap
    val toks = tokenize(pattern)
    var pos = 0
    def peek: String = if (pos < toks.length) toks(pos) else ""
    def take(): String = { val t = peek; pos += 1; t }
    def parseAlt(): Pat = {
      val first = parseCat()
      if (peek != "|") first
      else {
        val ps = scala.collection.mutable.ListBuffer(first)
        while (peek == "|") { take(); ps += parseCat() }
        Alt(ps.toList)
      }
    }
    def parseCat(): Pat = {
      val ps = scala.collection.mutable.ListBuffer[Pat]()
      while (peek.nonEmpty && peek != "|" && peek != ")" && peek != "," &&
        peek != "-}") ps += parseRep()
      if (ps.isEmpty) sys.error(s"empty pattern branch in: $pattern")
      if (ps.length == 1) ps.head else Cat(ps.toList)
    }
    def parseRep(): Pat = {
      val atom = parseAtom()
      peek match {
        case "*" => take(); Rep(atom, 0, -1)
        case "+" => take(); Rep(atom, 1, -1)
        case "?" => take(); Rep(atom, 0, 1)
        case t if t.startsWith("{") && t != "{-" =>
          take()
          val body = t.substring(1, t.length - 1)
          val parts = body.split(",", -1)
          val lo = parts(0).trim.toInt
          val hi =
            if (parts.length == 1) lo
            else if (parts(1).trim.isEmpty) -1
            else parts(1).trim.toInt
          require(hi == -1 || hi >= lo, s"bad quantifier {$body}")
          Rep(atom, lo, hi)
        case _ => atom
      }
    }
    def parseAtom(): Pat = {
      val t = take()
      if (t == "(") {
        val inner = parseAlt()
        require(take() == ")", s"unclosed group in: $pattern")
        inner
      } else if (t == "^") Anchor(atStart = true)
      else if (t == "$") Anchor(atStart = false)
      else if (t == "{-") {
        // SQL:2016 exclusion: match like the inner pattern, suppress
        // its rows from ALL ROWS output
        val inner = parseAlt()
        require(take() == "-}", s"unclosed exclusion {- in: $pattern")
        Excl(inner)
      } else if (t.equalsIgnoreCase("permute") && peek == "(") {
        // SQL:2016 PERMUTE(e1, ..., en) (round 10): matches the
        // elements in ANY order, preferring permutations in
        // lexicographic order of the listed positions — exactly an
        // alternation over the n! orderings, which is how the standard
        // defines it and what the backtracker's branch order gives.
        take() // "("
        val es = scala.collection.mutable.ListBuffer[Pat](parseAlt())
        while (peek == ",") { take(); es += parseAlt() }
        require(take() == ")", s"unclosed PERMUTE in: $pattern")
        require(es.length <= 6,
          s"PERMUTE of ${es.length} elements expands to ${es.length}! " +
            "alternation branches — cap is 6 (720); restructure the pattern")
        Alt(es.toList.permutations.map(ps =>
          if (ps.length == 1) ps.head else Cat(ps)).toList)
      } else symIdx.get(t) match {
        case Some(i) => Sym(i)
        case None    => sys.error(s"unknown symbol '$t' in pattern: $pattern")
      }
    }
    val res = parseAlt()
    require(pos == toks.length, s"trailing tokens in pattern: $pattern")
    res
  }

  private def tokenize(p: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < p.length) {
      val c = p(i)
      if (c.isWhitespace) i += 1
      else if ("()|*+?,^$".indexOf(c) >= 0) { out += c.toString; i += 1 }
      else if (c == '{' && i + 1 < p.length && p(i + 1) == '-') {
        out += "{-"; i += 2 // exclusion open
      } else if (c == '-' && i + 1 < p.length && p(i + 1) == '}') {
        out += "-}"; i += 2 // exclusion close
      } else if (c == '{') {
        val j = p.indexOf('}', i)
        require(j > i, s"unclosed quantifier in: $p")
        out += p.substring(i, j + 1); i = j + 1
      } else {
        var j = i
        while (j < p.length && (p(j).isLetterOrDigit || p(j) == '_')) j += 1
        require(j > i, s"unexpected char '${p(i)}' in pattern: $p")
        out += p.substring(i, j); i = j
      }
    }
    out.result()
  }

  // ---- matcher --------------------------------------------------------

  /** One match: [start, end) row span plus per-row classifier; `excl`
    * (round 10) marks rows consumed inside `{- -}` exclusions —
    * suppressed from ALL ROWS output, still classified and measured —
    * null when the pattern has no exclusions. */
  private[graft] final case class Match(start: Int, end: Int, cls: Array[Int],
                                        excl: Array[Boolean] = null)

  private[graft] def hasExcl(p: Pat): Boolean = p match {
    case Excl(_)       => true
    case Cat(ps)       => ps.exists(hasExcl)
    case Alt(ps)       => ps.exists(hasExcl)
    case Rep(p0, _, _) => hasExcl(p0)
    case _             => false
  }

  /** Backtracking step budget per key group — patterns are small and
    * rows consume on every Sym, so real workloads sit far below this;
    * a pathological pattern fails loudly instead of looping. */
  private val MaxSteps = 10_000_000L

  // ---- AFTER MATCH skip modes (SQL:2016) -----------------------------

  private[graft] sealed trait Skip
  /** Resume after the match's last row (non-overlapping; default). */
  private[graft] case object SkipPastLast extends Skip
  /** Resume one row after the match's FIRST row — overlapping matches. */
  private[graft] case object SkipToNextRow extends Skip
  /** Resume AT the first/last row the match classified as any symbol
    * in `symIdxs` (that row may start the next match). A singleton set
    * is SKIP TO FIRST/LAST symbol; a larger set spells a SQL:2016
    * SUBSET variable (round 10) — first/last over the union of the
    * members' mapped rows. Runtime error — per the standard — when the
    * match maps no row to any member, or when the resume point IS the
    * match's first row (infinite loop). */
  private[graft] final case class SkipToSym(symIdxs: Set[Int], first: Boolean) extends Skip

  /** Parse a skip spec: "past last row" (or "", the default), "to next
    * row", "to first SYM", "to last SYM" — case-insensitive, optional
    * leading "skip", whitespace collapsed. SYM may be an "A|B" union
    * spelling (a SUBSET variable's member expansion, round 10). */
  private[graft] def parseSkip(spec: String, symbols: Seq[String]): Skip = {
    val t = spec.trim.replaceAll("""\s+""", " ").toLowerCase match {
      case s if s.startsWith("skip ") => s.substring(5)
      case s => s
    }
    val symRx = """to (first|last) (\w+(?:\|\w+)*)""".r
    t match {
      case "" | "past last row" => SkipPastLast
      case "to next row"        => SkipToNextRow
      case symRx(fl, syms) =>
        val is = syms.split("""\|""").toSet[String].map { sym =>
          val i = symbols.indexWhere(_.equalsIgnoreCase(sym))
          require(i >= 0, s"AFTER MATCH SKIP TO ${fl.toUpperCase} ${sym.toUpperCase}: " +
            s"unknown pattern symbol '$sym'")
          i
        }
        SkipToSym(is, fl == "first")
      case other => sys.error(s"bad AFTER MATCH skip spec '$spec' — want: " +
        "PAST LAST ROW | TO NEXT ROW | TO FIRST <sym> | TO LAST <sym>")
    }
  }

  /** Classifier-history evaluation hook (round 10): a symbol whose
    * DEFINE navigates the match-so-far (`FIRST`/`LAST(sym.col)`,
    * SQL:2016 RUNNING semantics) cannot precompute to a boolean column
    * — the matcher consults this DURING matching. `isNav(i)` marks the
    * symbols that need it; for those, `truth` holds the predicate's
    * precomputable residue (`true` when the whole predicate navigates)
    * and `eval` decides admission given the live classifier array:
    * `cls(start until pos)` is the attempt's history, row `pos` is the
    * candidate, tentatively classified `sym` (the standard's rule: the
    * row under evaluation counts as classified by the symbol being
    * defined). */
  private[graft] trait NavCtx {
    def isNav(sym: Int): Boolean
    /** `mnum` (round 11) is the number the in-flight match will receive
      * if it completes — `MATCH_NUMBER()` inside DEFINE reads it. It is
      * monotone within a key group, so a predicate gating on it can
      * only stop admitting, never resume. */
    def eval(cls: Array[Int], start: Int, pos: Int, sym: Int, mnum: Long): Boolean
  }

  /** All matches in one key group (rows already in order): leftmost
    * start, greedy quantifiers; `skip` picks the resume point after
    * each non-empty match (see [[Skip]]); `nav` (round 10) is the
    * classifier-history evaluator for FIRST/LAST-navigating symbols —
    * null when no symbol navigates. `keepEmpty` (round 10, SQL:2016
    * SHOW EMPTY MATCHES): an EMPTY match — the pattern accepts at a
    * row consuming nothing — is emitted as Match(start, start, []) and
    * consumes a match number; matching always resumes at the next row
    * after one (no rows to skip over, any other resume would loop).
    * With keepEmpty=false (the OMIT default) empty matches are
    * dropped, as before. */
  private[graft] def findMatches(truth: Array[Array[Boolean]], pat: Pat,
                                 skip: Skip = SkipPastLast,
                                 nav: NavCtx = null,
                                 keepEmpty: Boolean = false): Seq[Match] = {
    val n = truth.length
    val out = scala.collection.mutable.ArrayBuffer[Match]()
    val cls = Array.fill(n)(-1)
    // exclusion marks, maintained like cls (set on accept, restored on
    // backtrack); allocated only when the pattern has {- -}
    val excl: Array[Boolean] = if (hasExcl(pat)) new Array[Boolean](n) else null
    var steps = 0L
    var start = 0 // current attempt's start — nav evaluation reads it
    // CPS backtracking: m(p, pos, k) tries to match p starting at pos,
    // calling k(end) for each admissible end in preference order
    // (greedy first); returns true as soon as any continuation accepts.
    def m(p: Pat, pos: Int, k: Int => Boolean): Boolean = {
      steps += 1
      if (steps > MaxSteps) sys.error("pattern match exceeded backtracking budget")
      p match {
        case Sym(i) =>
          if (pos < n && truth(pos)(i) &&
            (nav == null || !nav.isNav(i) ||
              nav.eval(cls, start, pos, i, out.size + 1L))) {
            val prev = cls(pos); cls(pos) = i
            if (k(pos + 1)) true else { cls(pos) = prev; false }
          } else false
        case Anchor(s) =>
          // consumes nothing; admissible only at the partition edge
          (if (s) pos == 0 else pos == n) && k(pos)
        case Excl(p0) =>
          // match exactly like p0; on each accepted end, mark the span
          // excluded for the continuation, restore on backtrack
          m(p0, pos, e => {
            if (excl != null) java.util.Arrays.fill(excl, pos, e, true)
            if (k(e)) true
            else {
              if (excl != null) java.util.Arrays.fill(excl, pos, e, false)
              false
            }
          })
        case Cat(ps) =>
          def cat(rest: List[Pat], at: Int): Boolean = rest match {
            case Nil     => k(at)
            case h :: tl => m(h, at, e => cat(tl, e))
          }
          cat(ps, pos)
        case Alt(ps) => ps.exists(alt => m(alt, pos, k))
        case Rep(Sym(si), min, max) =>
          // Iterative fast path for symbol runs (S+, S*, S{n,m}) — the
          // hot shape. Consumes the run with a loop instead of one
          // recursion frame per row (a 100k-row run must not overflow
          // the stack), then tries continuation ends greedily. For a
          // NAV symbol the run extends incrementally with cls updated
          // row by row — FIRST/LAST read the match-so-far, which
          // includes the run's own earlier rows (RUNNING semantics);
          // the same loop shape keeps long nav runs off the stack.
          val navHere = nav != null && nav.isNav(si)
          var end = pos
          val saved: Array[Int] =
            if (navHere) {
              // admission consults the evaluator with cls reflecting the
              // run's own earlier rows, so save-then-write row by row
              val buf = scala.collection.mutable.ArrayBuffer[Int]()
              var go = true
              while (go && end < n && truth(end)(si) &&
                (max == -1 || end - pos < max)) {
                if (nav.eval(cls, start, end, si, out.size + 1L)) {
                  buf += cls(end); cls(end) = si; end += 1
                } else go = false
              }
              buf.toArray
            } else {
              while (end < n && truth(end)(si) && (max == -1 || end - pos < max)) end += 1
              val s = java.util.Arrays.copyOfRange(cls, pos, end)
              java.util.Arrays.fill(cls, pos, end, si)
              s
            }
          var take = end - pos
          var ok = false
          while (!ok && take >= min) {
            steps += 1
            ok = k(pos + take)
            if (!ok) {
              take -= 1
              if (take >= 0 && pos + take < end) cls(pos + take) = saved(take)
            }
          }
          if (!ok) System.arraycopy(saved, 0, cls, pos, end - pos)
          ok
        case Rep(p0, min, max) =>
          def rep(count: Int, at: Int): Boolean = {
            val more = (max == -1 || count < max) &&
              m(p0, at, e => if (e == at) false else rep(count + 1, e)) // progress guard
            if (more) true
            else if (count >= min) k(at)
            // below min with no consuming iteration left: the remaining
            // required iterations may still be satisfiable as EMPTY
            // matches of p0 (e.g. (A?){2} over one A row — SQL:2016
            // admits the empty second iteration). One empty match of p0
            // proves all remaining iterations can be empty.
            else if (m(p0, at, e => e == at)) k(at)
            else false
          }
          rep(0, pos)
      }
    }
    // Leftmost-start skip for the common hot shape: when the pattern
    // HEAD is an unbounded greedy symbol run (S* / S+ / S{n,}), a failed
    // match that started at row `start` inside an S-run has already
    // tried every continuation position start..runEnd (head lengths
    // run..min) — restarting one row later retries a strict subset of
    // those continuation positions and must fail too. Skipping to the
    // run's end turns the monotone-run worst case (a long D run with no
    // U after it, for `D+ U` AND for the optional-head `D* U`) from
    // O(run^2) into O(run). Bounded heads (S{n,m}) are excluded: from
    // start+1 the continuation can reach position start+1+m, which the
    // attempt from start never tried.
    // The head-run skip is UNSOUND whenever ANY symbol navigates: its
    // argument assumes the continuation's admissibility is independent
    // of the attempt's start, but FIRST/LAST over the match-so-far
    // change with the start row (a later start shortens the history a
    // downstream nav predicate reads) — so a start that failed inside a
    // head run does NOT imply later starts fail. Disable it; nav
    // workloads pay the per-start retry the standard's semantics imply.
    val headSym: Int = if (nav != null) -1 else {
      def head(p: Pat): Option[Int] = p match {
        case Rep(Sym(i), min, -1) if min >= 0 => Some(i)
        case Cat(h :: _)                      => head(h)
        case _                                => None
      }
      head(pat).getOrElse(-1)
    }
    while (start < n) {
      var matchedEnd = -1
      // greedy: the first end the backtracking order reaches IS the
      // preferred (longest-quantifier) parse; record and stop.
      m(pat, start, e => { matchedEnd = e; true })
      if (matchedEnd > start) {
        val m = Match(start, matchedEnd, cls.slice(start, matchedEnd),
          if (excl == null) null
          else java.util.Arrays.copyOfRange(excl, start, matchedEnd))
        out += m
        java.util.Arrays.fill(cls, start, matchedEnd, -1)
        if (excl != null) java.util.Arrays.fill(excl, start, matchedEnd, false)
        // the head-run failure skip below stays valid in every mode —
        // its argument is about FAILED attempts only
        start = skip match {
          case SkipPastLast  => matchedEnd
          case SkipToNextRow => start + 1
          case SkipToSym(sis, first) =>
            val rel = if (first) m.cls.indexWhere(sis.contains)
                      else m.cls.lastIndexWhere(sis.contains)
            if (rel < 0) sys.error(
              s"AFTER MATCH SKIP TO ${if (first) "FIRST" else "LAST"} symbol(s) " +
                s"${sis.toSeq.sorted.mkString("|")}: the match maps no row there " +
                "(SQL:2016 runtime error — guard the pattern so the symbol " +
                "always participates)")
            if (rel == 0) sys.error(
              s"AFTER MATCH SKIP TO ${if (first) "FIRST" else "LAST"} symbol(s) " +
                s"${sis.toSeq.sorted.mkString("|")} resumes at the match's own " +
                "first row — infinite loop (SQL:2016 runtime error; use SKIP TO " +
                "NEXT ROW instead)")
            m.start + rel
        }
      } else {
        // empty match (matchedEnd == start) consumes nothing and its
        // accepting path touched no Sym, so cls needs no cleanup —
        // failed subtrees restored their writes on backtrack (an O(n)
        // defensive wipe here would make all-optional patterns like
        // "D* U*" quadratic in group size)
        if (keepEmpty && matchedEnd == start) {
          // SHOW EMPTY MATCHES: the accept-at-start IS a match — it
          // takes a match number, its output row is the starting row,
          // and matching resumes at the next row (nothing to skip).
          // The head-run failure skip below must NOT fire here: every
          // row of the run starts its OWN empty match.
          out += Match(start, start, Array.emptyIntArray)
          start += 1
        } else if (headSym >= 0 && truth(start)(headSym)) {
          var e = start + 1
          while (e < n && truth(e)(headSym)) e += 1
          start = e // every start inside the failed head run fails too
        } else start += 1
      }
    }
    out.toSeq
  }

  // ---- measures -------------------------------------------------------

  /** A measure column. `agg` in
    * first|last|min|max|sum|avg|count|countf|classifier (classifier =
    * the symbol name of the latest qualifying row — the SQL
    * CLASSIFIER() function; countf = SQL COUNT(S.col), non-null rows
    * only, where count is the COUNT(*) / COUNT(S.*) row count; avg
    * reads out DOUBLE for every numeric family); `symbol` restricts to
    * rows the winning path classified as that symbol — "*" = every
    * matched row, and a `"A|B"` union spelling covers SQL:2016 SUBSET
    * variables; `field` is the input column the aggregate reads
    * (ignored for count and classifier). `running = true` (ALL ROWS PER MATCH only) evaluates
    * the aggregate over the match's rows UP TO each output row — the
    * SQL RUNNING semantics, the ALL ROWS default; `false` is FINAL
    * (whole-match value: the ONE ROW mode's only semantics, and a
    * per-match constant column under ALL ROWS). `occ` (round 10, the
    * SQL:2016 occurrence argument, first/last only): FIRST(S.f, n)
    * reads the (n+1)-th qualifying row, LAST(S.f, n) the (n+1)-th
    * from the end — null when the match maps fewer rows. */
  final case class Measure(name: String, agg: String, symbol: String,
                           field: String = "", running: Boolean = false,
                           occ: Int = 0)

  /** A classifier-history navigation reference (round 10): inside a
    * DEFINE predicate, `FIRST(sym.field)` / `LAST(sym.field)` read
    * `field` at the first/last row the match-so-far classified as
    * `symbol` — SQL:2016 RUNNING semantics, the row under evaluation
    * included when it is being tried AS `symbol`; null (predicate
    * false) when the symbol has no row yet. The predicate [[Column]]
    * reads the value through the placeholder column `name`, which must
    * not exist on the input — the matcher binds it per candidate row.
    * Unlike PREV/NEXT this cannot precompute as a window column: the
    * value depends on the in-flight classification, so the NFA
    * evaluates the whole predicate DURING matching (a compiled
    * row-level predicate over input row + placeholders; plain symbols
    * stay precomputed codegen booleans). Cost: one history scan per
    * candidate row per nav reference, and the head-run start skip is
    * disabled (start-dependent history makes it unsound) — keep nav
    * predicates to the symbols that need them. `occ` (round 10): the
    * SQL:2016 occurrence argument — FIRST(sym.f, n) reads the
    * (n+1)-th qualifying row of the match-so-far, LAST the (n+1)-th
    * from its end; null (predicate false) when fewer exist yet.
    * `symbol` accepts the "A|B" union spelling (like
    * [[Measure.symbol]]) — a SQL:2016 SUBSET variable navigates the
    * union of its members' mapped rows.
    *
    * `kind` (round 11) widens the same placeholder mechanism to the
    * last DEFINE-side SQL:2016 functions:
    *  - `"field"` (default): the FIRST/LAST(sym.field) read above.
    *  - `"cls"`: `FIRST/LAST(CLASSIFIER([sym])[, occ])` — the value is
    *    the NAME of the symbol the match-so-far classified the
    *    navigated row as (STRING; the candidate row reads the symbol
    *    being tried). `symbol = "*"` means any matched row (bare
    *    CLASSIFIER()); `field` is ignored.
    *  - `"clsprev"`: `PREV(CLASSIFIER(), occ)` — the classifier of the
    *    row `occ` physical rows before the candidate; NULL when that
    *    row precedes the match's start (rows outside the current match
    *    have no classifier, per the standard).
    *  - `"matchnum"`: `MATCH_NUMBER()` — the LONG number the in-flight
    *    match will take. Monotone per key group, so gates like
    *    `MATCH_NUMBER() <= k` truncate cleanly. */
  final case class NavRef(name: String, first: Boolean, symbol: String,
                          field: String, occ: Int = 0, kind: String = "field")

  /** Incremental measure accumulator — ONE implementation evaluates
    * both FINAL (fed the whole match) and RUNNING (value read after
    * each row) semantics, so the two modes can never drift. */
  private sealed trait Acc { def add(v: Any): Unit; def value: Any }

  private def accFor(msr: Measure, ft: => DataType): Acc = msr.agg match {
    case "count" => new Acc {
      private var c = 0L
      def add(v: Any): Unit = c += 1
      def value: Any = c
    }
    case "countf" => new Acc {
      // COUNT(S.col): non-null qualifying rows only (SQL:2016 — the
      // row-count form is COUNT(*) / COUNT(S.*))
      private var c = 0L
      def add(v: Any): Unit = if (v != null) c += 1
      def value: Any = c
    }
    case "avg" => ft match {
      // AVG reads out as DOUBLE for every family (see measureType);
      // nulls are skipped and an all-null match reads null. Integral
      // fields sum exactly in BigInt with ONE divide at read — a
      // per-row double accumulation would corrupt |v| > 2^53 ids and
      // drift from the oracle's exact-sum-then-divide convention.
      case DoubleType | FloatType => new Acc {
        private var c = 0L; private var s = 0.0
        def add(v: Any): Unit = if (v != null) {
          s += v.asInstanceOf[java.lang.Number].doubleValue(); c += 1
        }
        def value: Any = if (c == 0L) null else s / c
      }
      case ByteType | ShortType | IntegerType | LongType => new Acc {
        private var c = 0L; private var s = BigInt(0)
        def add(v: Any): Unit = if (v != null) {
          s += v.asInstanceOf[java.lang.Number].longValue(); c += 1
        }
        def value: Any =
          if (c == 0L) null
          else (BigDecimal(s, java.math.MathContext.DECIMAL128) / c).toDouble
      }
      case _: DecimalType => new Acc {
        private var c = 0L; private var s: java.math.BigDecimal = null
        def add(v: Any): Unit = if (v != null) {
          val d = v.asInstanceOf[java.math.BigDecimal]
          s = if (s == null) d else s add d; c += 1
        }
        def value: Any =
          if (c == 0L) null
          else s.divide(new java.math.BigDecimal(c),
            java.math.MathContext.DECIMAL128).doubleValue()
      }
      case other => sys.error(
        s"measure ${msr.name}: avg over unsupported field type $other — " +
          "supported: TINYINT/SMALLINT/INT/BIGINT/FLOAT/DOUBLE/DECIMAL " +
          "(cast DATE/STRING fields explicitly first)")
    }
    case "first" => new Acc {
      // occ-th qualifying row, 0-based (SQL:2016 occurrence argument);
      // null until that row arrives
      private var seen = 0; private var x: Any = null
      def add(v: Any): Unit = { if (seen == msr.occ) x = v; seen += 1 }
      def value: Any = x
    }
    case "last" if msr.occ > 0 => new Acc {
      // occ-th from the END: ring of the last occ+1 values — full ring
      // means the head IS that row; fewer -> null (per the standard)
      private val ring = new scala.collection.mutable.Queue[Any]()
      def add(v: Any): Unit = {
        ring.enqueue(v)
        if (ring.length > msr.occ + 1) ring.dequeue()
      }
      def value: Any = if (ring.length == msr.occ + 1) ring.head else null
    }
    case "last" | "classifier" => new Acc {
      private var x: Any = null
      def add(v: Any): Unit = x = v
      def value: Any = x
    }
    case "min" | "max" | "sum" => ft match {
      case DoubleType | FloatType => new Acc {
        // nulls skipped; running start value is the first non-null —
        // 0.0+x1 == x1 exactly, so the incremental sum matches a
        // whole-list fold bit for bit. min/max compare in the TOTAL
        // order (Double.compare: NaN greatest, -0.0 < 0.0) — the
        // ordering Spark's own Min/Max and the DuckDB oracle use, so
        // MIN ignores NaN unless all values are NaN while MAX surfaces
        // it (math.min/math.max would instead poison MIN with NaN).
        private var any = false; private var acc = 0.0
        def add(v: Any): Unit = if (v != null) {
          val d = v.asInstanceOf[java.lang.Number].doubleValue()
          if (!any) { acc = d; any = true }
          else acc = msr.agg match {
            case "sum" => acc + d
            case "min" => if (java.lang.Double.compare(d, acc) < 0) d else acc
            case _     => if (java.lang.Double.compare(d, acc) > 0) d else acc
          }
        }
        def value: Any = if (any) acc else null
      }
      case dt: DecimalType => new Acc {
        // exact BigDecimal arithmetic in the field's scale; a sum past
        // the widened output precision fails loudly at read time
        private var acc: java.math.BigDecimal = null
        def add(v: Any): Unit = if (v != null) {
          val d = v.asInstanceOf[java.math.BigDecimal]
          acc = if (acc == null) d else msr.agg match {
            case "sum" => acc add d
            case "min" => if (d.compareTo(acc) < 0) d else acc
            case _     => if (d.compareTo(acc) > 0) d else acc
          }
        }
        def value: Any =
          if (acc == null) null
          else if (msr.agg != "sum") acc
          else {
            val outP = math.min(38, dt.precision + 10)
            if (acc.precision - acc.scale > outP - dt.scale)
              sys.error(s"sum measure ${msr.name} overflows DECIMAL($outP,${dt.scale}): $acc")
            acc.setScale(dt.scale)
          }
      }
      case ByteType | ShortType | IntegerType | LongType => new Acc {
        // integral fields aggregate in LONG arithmetic — a Double
        // round-trip corrupts |v| > 2^53 (snowflake-style BIGINT ids).
        // Sums ride BigInt (order-independent, no transient-overflow
        // raise) and range-check at read; a true overflow stays loud.
        private var any = false; private var mm = 0L
        private var s = BigInt(0)
        def add(v: Any): Unit = if (v != null) {
          val l = v match {
            case n: java.lang.Number => n.longValue()
            case other => sys.error(s"non-numeric measure field ${msr.field}: $other")
          }
          if (msr.agg == "sum") s += l
          else if (!any) mm = l
          else mm = if (msr.agg == "min") math.min(mm, l) else math.max(mm, l)
          any = true
        }
        def value: Any =
          if (!any) null
          else if (msr.agg != "sum") mm
          else if (s.isValidLong) s.toLong
          else sys.error(s"sum measure ${msr.name} overflows BIGINT: $s")
      }
      case other => sys.error(
        s"measure ${msr.name}: ${msr.agg} over unsupported field type $other — " +
          "supported: TINYINT/SMALLINT/INT/BIGINT/FLOAT/DOUBLE/DECIMAL " +
          "(cast DATE/STRING fields explicitly first)")
    }
    case other => sys.error(s"unknown measure agg: $other")
  }

  /** Order-by entries are `"col"`, `"col [ASC|DESC] [NULLS
    * FIRST|LAST]"` (case-insensitive): the matcher reads each key
    * group in exactly this order, so DESC reverses the stream the NFA
    * walks and an explicit NULLS placement (round 10) moves null rows
    * to the chosen end of it — SQL:2016 `ORDER BY` inside
    * MATCH_RECOGNIZE. Defaults follow the engine's sort (Spark): ASC =
    * NULLS FIRST, DESC = NULLS LAST. Returns (col, ascending,
    * nullsFirst). */
  private[graft] def orderSpec(orderBy: Seq[String]): Seq[(String, Boolean, Boolean)] =
    orderBy.map { o =>
      val t = o.trim.replaceAll("""\s+""", " ")
      val nm = ("""(?i)^(.*?) nulls (first|last)$""").r
      val (base, nulls) = t match {
        case nm(b, w) => (b.trim, Some(w.equalsIgnoreCase("first")))
        case _        => (t, None)
      }
      val (c, asc) = base.split(" ") match {
        case Array(c0)                                  => (c0, true)
        case Array(c0, d) if d.equalsIgnoreCase("asc")  => (c0, true)
        case Array(c0, d) if d.equalsIgnoreCase("desc") => (c0, false)
        case _ => sys.error(
          s"bad order spec '$o' (want: col [ASC|DESC] [NULLS FIRST|LAST])")
      }
      (c, asc, nulls.getOrElse(asc)) // engine default: ASC first, DESC last
    }

  /** Run the pattern over `df`. Output: partitionBy columns, then
    * `match_num` (1-based per partition key, in order), then one
    * column per measure.
    *
    * `skip` is the AFTER MATCH spec ([[parseSkip]]): "past last row"
    * (default), "to next row" (overlapping matches — resume one row
    * after each match's first row), "to first SYM" / "to last SYM"
    * (resume AT that row; SQL:2016 runtime errors on no-such-row or
    * resume-at-first-row). Same single-shuffle plan — skip mode only
    * changes the in-group scan.
    *
    * `prePartitioned = true` asserts the CALLER's contract that `df`
    * is already hash-distributed by `partitionBy` and sorted within
    * partitions by `partitionBy ++ orderBy` — true whenever the input
    * just came through a window over the same keys (the PREV/NEXT
    * precompute pattern). The matcher then skips its own exchange +
    * sort, avoiding a second full shuffle of the stream on the same
    * key. CAUTION: the matcher's runtime guard detects fragmentation
    * only WITHIN a Spark partition; a key group split ACROSS partitions
    * (input sorted in files but never hash-clustered) silently yields
    * per-fragment matches with restarted match_num. When the input's
    * provenance is anything other than a same-key exchange in this
    * plan, run [[validatePrePartitioned]] first (one cheap extra job)
    * or leave prePartitioned = false. */
  def matchPattern(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      symbols: Seq[(String, Column)],
      pattern: String,
      measures: Seq[Measure],
      prePartitioned: Boolean = false,
      skip: String = "past last row",
      navRefs: Seq[NavRef] = Nil): DataFrame =
    run(df, partitionBy, orderBy, symbols, pattern, measures,
      prePartitioned, allRows = false, skip, navRefs)

  /** ALL ROWS PER MATCH mode (SQL:2016 / Trino): one OUTPUT row per
    * MATCHED input row — partition keys, order columns, `match_num`,
    * `classifier` (the symbol the winning path assigned to that row),
    * then one column per measure (round 9): `running = true` measures
    * carry the aggregate over the match's rows UP TO each output row
    * (the SQL RUNNING default for this mode), `false` the whole-match
    * FINAL value as a per-match constant. Same skip semantics and
    * scale shape as [[matchPattern]].
    *
    * Round 10 — the two SQL:2016 sub-modes beyond the OMIT default:
    *  - `emptyMatches = "show"` (SHOW EMPTY MATCHES): an empty match —
    *    the pattern accepts at a row consuming nothing — emits ONE
    *    output row carrying the starting row's order columns, a match
    *    number of its own, a NULL classifier, and measures over the
    *    empty row set (COUNT 0, everything else null); matching
    *    resumes at the next row. `"omit"` (default) drops them.
    *  - `unmatchedRows = true` (WITH UNMATCHED ROWS): rows in no match
    *    (and not an empty-match start) ALSO emit, with NULL match_num,
    *    classifier and measures — the mode that makes ALL ROWS a total
    *    function of the input. Implies SHOW EMPTY MATCHES (the
    *    standard's rule). match_num is nullable only in this mode. */
  def matchPatternAllRows(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      symbols: Seq[(String, Column)],
      pattern: String,
      measures: Seq[Measure] = Nil,
      prePartitioned: Boolean = false,
      skip: String = "past last row",
      navRefs: Seq[NavRef] = Nil,
      emptyMatches: String = "omit",
      unmatchedRows: Boolean = false): DataFrame = {
    require(emptyMatches == "omit" || emptyMatches == "show",
      s"emptyMatches must be 'omit' or 'show', got '$emptyMatches'")
    run(df, partitionBy, orderBy, symbols, pattern, measures,
      prePartitioned, allRows = true, skip, navRefs,
      showEmpty = emptyMatches == "show" || unmatchedRows,
      withUnmatched = unmatchedRows)
  }

  /** Global check of the `prePartitioned` contract: every partition-key
    * group must live entirely inside one Spark partition, contiguously.
    * Counts key runs per partition (streaming, O(1) memory — valid
    * because the contract also requires sorting by the keys) and
    * compares the sum against the global distinct key count: equal iff
    * no key spans two partitions AND each partition is key-clustered.
    * One extra narrow job over the key columns only; use when feeding
    * `prePartitioned = true` from input whose distribution is asserted
    * rather than produced by this plan (e.g. pre-sorted files). The
    * in-matcher guard cannot catch cross-partition splits — this can.
    * Throws on violation. */
  def validatePrePartitioned(df: DataFrame, partitionBy: Seq[String]): Unit = {
    val keys = df.select(partitionBy.map(col): _*)
    val global = keys.distinct().count()
    val runSum = keys.mapPartitions { it =>
      var cnt = 0L
      var prev: Seq[Any] = null
      it.foreach { r =>
        val k = r.toSeq
        if (prev == null || k != prev) { cnt += 1; prev = k }
      }
      Iterator.single(cnt)
    }(Encoders.scalaLong).reduce(_ + _)
    require(runSum == global,
      s"prePartitioned contract violated: $global distinct key groups but $runSum " +
        s"per-partition key runs — some group spans partitions or a partition is " +
        s"not key-clustered; shuffle first (prePartitioned = false)")
  }

  private def run(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      symbols: Seq[(String, Column)],
      pattern: String,
      measures: Seq[Measure],
      prePartitioned: Boolean,
      allRows: Boolean,
      skipSpec: String = "past last row",
      navRefs: Seq[NavRef] = Nil,
      showEmpty: Boolean = false,
      withUnmatched: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
      BasePredicate, BoundReference, GenericInternalRow, JoinedRow,
      SubqueryExpression, Expression, Predicate => CatPredicate}
    import org.apache.spark.sql.catalyst.plans.logical.Project

    val symNames = symbols.map(_._1)
    val pat = parse(pattern, symNames)
    val skip = parseSkip(skipSpec, symNames)
    val orderCols = orderSpec(orderBy)
    val orderNames = orderCols.map(_._1)
    val inSchema = df.schema
    def fieldType(f: String): DataType = inSchema(inSchema.fieldIndex(f)).dataType

    // ---- classifier-history navigation (round 10): resolve each
    // DEFINE predicate against input + placeholder schema; symbols
    // whose predicate reads a placeholder become NAV symbols (evaluated
    // in the matcher), the rest keep the codegen'd boolean column path
    val navNames = navRefs.map(_.name)
    require(navNames.distinct.length == navNames.length,
      s"duplicate nav placeholder names: ${navNames.mkString(",")}")
    navRefs.foreach { r =>
      r.kind match {
        case "field" =>
          r.symbol.split("""\|""").foreach(s0 => require(symNames.contains(s0),
            s"nav ref ${r.name}: unknown pattern symbol '$s0' in '${r.symbol}'"))
          require(inSchema.fieldNames.contains(r.field),
            s"nav ref ${r.name}: unknown input column '${r.field}'")
        case "cls" =>
          if (r.symbol != "*")
            r.symbol.split("""\|""").foreach(s0 => require(symNames.contains(s0),
              s"nav ref ${r.name}: unknown pattern symbol '$s0' in '${r.symbol}'"))
        case "clsprev" =>
          require(r.occ >= 1,
            s"nav ref ${r.name}: PREV(CLASSIFIER(), n) needs n >= 1 (n = 0 is " +
              "the current row — spell it CLASSIFIER())")
        case "matchnum" => ()
        case other => sys.error(s"nav ref ${r.name}: unknown kind '$other' " +
          "(want field | cls | clsprev | matchnum)")
      }
      require(!inSchema.fieldNames.contains(r.name),
        s"nav placeholder '${r.name}' collides with an input column — rename it")
    }
    val navFieldSchema = navRefs.map(r => StructField(r.name, r.kind match {
      case "field"           => fieldType(r.field)
      case "cls" | "clsprev" => StringType
      case "matchnum"        => LongType
    }, nullable = true))
    // (symbol name, resolved predicate or null, referenced input cols)
    val navResolved: Map[String, (Expression, Seq[String])] =
      if (navRefs.isEmpty) Map.empty
      else {
        val resolveSchema = StructType(inSchema.fields ++ navFieldSchema)
        val dummy = df.sparkSession.createDataFrame(
          java.util.Collections.emptyList[Row](), resolveSchema)
        symbols.flatMap { case (nm, c) =>
          val analyzed = dummy.select(c.cast(BooleanType)).queryExecution.analyzed
          val e = analyzed.asInstanceOf[Project].projectList.head match {
            case a: Alias => a.child
            case other    => other
          }
          val refs = e.collect { case a: AttributeReference => a.name }.distinct
          if (refs.intersect(navNames).isEmpty) None // plain symbol
          else {
            require(e.find(_.isInstanceOf[SubqueryExpression]).isEmpty,
              s"DEFINE predicate for '$nm' navigates the match AND contains a " +
                "subquery — not supported (the matcher evaluates nav predicates " +
                "row-at-a-time); materialize the subquery into a column first")
            Some(nm -> (e, refs.filterNot(navNames.contains)))
          }
        }.toMap
      }
    val navActive = navResolved.nonEmpty

    require(allRows || measures.forall(!_.running),
      "RUNNING measures require ALL ROWS PER MATCH (ONE ROW emits each " +
        "match once, where RUNNING at the last row equals FINAL)")
    measures.foreach(m => require(
      m.occ == 0 || m.agg == "first" || m.agg == "last",
      s"measure ${m.name}: the occurrence argument applies to FIRST/LAST " +
        s"only, not ${m.agg}"))
    require(!(withUnmatched && hasExcl(pat)),
      "pattern exclusions {- -} cannot combine with ALL ROWS PER MATCH " +
        "WITH UNMATCHED ROWS (SQL:2016 prohibition — an excluded row is " +
        "neither output nor unmatched)")

    // min/max/sum carry the field's NATIVE numeric family end to end:
    // floating fields aggregate in Double, integral fields in LONG
    // arithmetic, DECIMAL fields in exact BigDecimal — min/max keep
    // the exact type, sum widens precision by 10 capped at 38, the
    // same rule Spark's own Sum aggregate applies (see [[accFor]]).
    def measureType(ms: Measure): DataType = ms.agg match {
      case "count" | "countf" => LongType
      case "classifier"     => StringType
      // AVG is DOUBLE whatever the input family — the DuckDB/Trino
      // convention for integral inputs, and the simplest exact-enough
      // contract for DECIMAL (one divide at read, not per-row)
      case "avg"            => DoubleType
      case "first" | "last" => fieldType(ms.field)
      case "min" | "max" | "sum" => fieldType(ms.field) match {
        case DoubleType | FloatType => DoubleType
        case ByteType | ShortType | IntegerType | LongType => LongType
        case dt: DecimalType =>
          if (ms.agg == "sum") DecimalType(math.min(38, dt.precision + 10), dt.scale)
          else dt
        case other => sys.error(
          s"measure ${ms.name}: ${ms.agg} over unsupported field type $other — " +
            "supported: TINYINT/SMALLINT/INT/BIGINT/FLOAT/DOUBLE/DECIMAL " +
            "(cast DATE/STRING fields explicitly first)")
      }
      case other => sys.error(s"unknown measure agg: $other")
    }
    val measureStructs = measures.map(ms => StructField(ms.name, measureType(ms)))

    val outSchema =
      if (allRows) StructType(
        (partitionBy ++ orderNames).map(c => inSchema(inSchema.fieldIndex(c))) ++
          // match_num is null only on WITH UNMATCHED rows; classifier
          // is also null on SHOW EMPTY match rows
          Seq(StructField("match_num", LongType, nullable = withUnmatched),
            StructField("classifier", StringType,
              nullable = showEmpty || withUnmatched)) ++
          measureStructs)
      else StructType(
        partitionBy.map(c => inSchema(inSchema.fieldIndex(c))) ++
          Seq(StructField("match_num", LongType, nullable = false)) ++
          measureStructs)

    // narrow, codegen'd projection: keys, order, measure inputs, and
    // one boolean per symbol predicate
    val measureFields = measures
      .filter(m => m.agg != "count" && m.agg != "classifier")
      .map(_.field).distinct
    // nav predicates read input columns row-at-a-time in the matcher,
    // so their references (and every nav target field) ride the narrow
    // projection; a NAV symbol's boolean column is a placeholder true —
    // the matcher evaluates the full predicate during matching
    val navInputFields =
      (navResolved.values.flatMap(_._2) ++
        navRefs.filter(_.kind == "field").map(_.field)).toSeq.distinct
    val projected = df.select(
      (partitionBy ++ orderNames ++ measureFields ++ navInputFields)
        .distinct.map(col) ++
        symbols.map { case (nm, c) =>
          (if (navResolved.contains(nm)) lit(true) else c.cast(BooleanType))
            .as(s"__sym_$nm")
        }: _*)
    val pSchema = projected.schema
    val keyIdx = partitionBy.map(pSchema.fieldIndex).toArray
    val orderIdx = orderNames.map(pSchema.fieldIndex).toArray
    val symIdxs = symNames.map(n => pSchema.fieldIndex(s"__sym_$n")).toArray
    val fieldIdx = measureFields.map(f => f -> pSchema.fieldIndex(f)).toMap
    val symOfName = symNames.zipWithIndex.toMap
    // per-measure qualifying-symbol sets: null = "*" (every matched
    // row); "A|B" unions spell SQL:2016 SUBSET variables
    val wantSets: Array[Set[Int]] = measures.map { m =>
      if (m.symbol == "*") null
      else m.symbol.split("""\|""").map { s =>
        symOfName.getOrElse(s, sys.error(
          s"measure ${m.name}: unknown pattern symbol '$s' in '${m.symbol}'"))
      }.toSet
    }.toArray
    val measureArr = measures.toArray
    val anyFinal = measureArr.exists(!_.running)
    val anyRunning = measureArr.exists(_.running)

    // bind nav predicates against (projected row ++ placeholder row):
    // the matcher evaluates them on a JoinedRow, so ordinals run over
    // pSchema then the placeholder block
    val navIsNav: Array[Boolean] = symNames.map(navResolved.contains).toArray
    val navBound: Array[Expression] =
      if (!navActive) null
      else {
        val boundSchema = StructType(pSchema.fields ++ navFieldSchema)
        require(boundSchema.fieldNames.distinct.length == boundSchema.length,
          s"nav placeholder names collide with matcher columns: " +
            navNames.filter(pSchema.fieldNames.contains).mkString(","))
        symNames.map { nm =>
          navResolved.get(nm).map { case (e, _) =>
            e.transform {
              case a: AttributeReference =>
                BoundReference(boundSchema.fieldIndex(a.name), a.dataType, a.nullable)
            }
          }.orNull
        }.toArray
      }
    // (kind: 0=field 1=cls 2=clsprev 3=matchnum, first?, target symbol
    // index set — unions spell SUBSETs, null = "*" any matched row,
    // field ordinal in pSchema (-1 for non-field kinds), field type,
    // occurrence / physical offset)
    val navRefArr: Array[(Int, Boolean, Set[Int], Int, DataType, Int)] =
      navRefs.map { r =>
        val kindI = r.kind match {
          case "field" => 0; case "cls" => 1; case "clsprev" => 2; case "matchnum" => 3
        }
        val tSyms =
          if (kindI >= 2 || r.symbol == "*") null
          else r.symbol.split("""\|""").map(symNames.indexOf).toSet
        val fOrd = if (kindI == 0) pSchema.fieldIndex(r.field) else -1
        val fType = if (kindI == 0) fieldType(r.field) else NullType
        (kindI, r.first, tSyms, fOrd, fType, r.occ)
      }.toArray
    // symbol names as UTF8String for CLASSIFIER placeholders — the
    // predicates evaluate over InternalRow, whose string format this is
    val symNamesU8: Array[org.apache.spark.unsafe.types.UTF8String] =
      symNames.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

    val sorted =
      if (prePartitioned) projected
      else projected
        .repartition(partitionBy.map(col): _*)
        .sortWithinPartitions(partitionBy.map(col) ++
          orderCols.map {
            case (c, true, true)   => col(c).asc_nulls_first
            case (c, true, false)  => col(c).asc_nulls_last
            case (c, false, true)  => col(c).desc_nulls_first
            case (c, false, false) => col(c).desc_nulls_last
          }: _*)

    sorted.mapPartitions { iter =>
      val buf = scala.collection.mutable.ArrayBuffer[Row]()
      var curKey: Seq[Any] = null
      // per-task nav machinery: compile each nav symbol's predicate
      // once (codegen with interpreted fallback), convert group rows to
      // InternalRow once, bind placeholder values per candidate row
      val navPreds: Array[BasePredicate] =
        if (!navActive) null
        else navBound.map(e =>
          if (e == null) null
          else { val p = CatPredicate.create(e); p.initialize(0); p })
      val toInternal =
        if (!navActive) null
        else CatalystTypeConverters.createToCatalystConverter(pSchema)

      def navCtxFor(rows: Array[Row]): NavCtx =
        if (!navActive) null
        else new NavCtx {
          private val internal: Array[InternalRow] =
            rows.map(r => toInternal(r).asInstanceOf[InternalRow])
          private val navVals = new Array[Any](navRefArr.length)
          private val navRow = new GenericInternalRow(navVals)
          private val joined = new JoinedRow()
          def isNav(s: Int): Boolean = navIsNav(s)
          def eval(cls: Array[Int], start: Int, pos: Int, sym: Int,
                   mnum: Long): Boolean = {
            var x = 0
            while (x < navRefArr.length) {
              val (kind, first, tSyms, fOrd, fType, occ) = navRefArr(x)
              navVals(x) = kind match {
                case 3 => mnum // MATCH_NUMBER(): the in-flight number
                case 2 =>
                  // PREV(CLASSIFIER(), occ): the classifier occ physical
                  // rows back — NULL before the match's start (rows
                  // outside the current match have no classifier)
                  val j = pos - occ
                  if (j < start) null else symNamesU8(cls(j))
                case _ =>
                  // history = cls(start until pos) plus the candidate
                  // row, tentatively classified `sym` (RUNNING
                  // semantics); occ skips that many qualifying rows from
                  // the chosen end; tSyms with >1 member is a SUBSET
                  // union, null = "*" (any matched row — every history
                  // row qualifies, and so does the candidate)
                  var j = -1
                  var skip = occ
                  if (first) {
                    var i = start
                    while (j < 0 && i < pos) {
                      if (tSyms == null || tSyms(cls(i))) {
                        if (skip == 0) j = i else skip -= 1
                      }
                      i += 1
                    }
                    if (j < 0 && skip == 0 && (tSyms == null || tSyms(sym))) j = pos
                  } else {
                    if (tSyms == null || tSyms(sym)) {
                      if (skip == 0) j = pos else skip -= 1
                    }
                    if (j < 0) {
                      var i = pos - 1
                      while (j < 0 && i >= start) {
                        if (tSyms == null || tSyms(cls(i))) {
                          if (skip == 0) j = i else skip -= 1
                        }
                        i -= 1
                      }
                    }
                  }
                  if (j < 0) null
                  else if (kind == 1) symNamesU8(if (j == pos) sym else cls(j))
                  else if (internal(j).isNullAt(fOrd)) null
                  else internal(j).get(fOrd, fType)
              }
              x += 1
            }
            navPreds(sym).eval(joined.apply(internal(pos), navRow))
          }
        }

      def emitGroup(): Iterator[Row] = {
        if (buf.isEmpty) Iterator.empty
        else {
          val rows = buf.toArray
          val truth = rows.map(r => symIdxs.map(i => !r.isNullAt(i) && r.getBoolean(i)))
          // ONE ROW PER MATCH always keeps empty matches — the
          // SQL:2016 grammar has no OMIT option there (each match,
          // empty included, produces its summary row and consumes a
          // match number); ALL ROWS keeps them only under SHOW EMPTY
          // MATCHES / WITH UNMATCHED ROWS. Non-nullable patterns are
          // unaffected either way.
          val ms = findMatches(truth, pat, skip, navCtxFor(rows),
            keepEmpty = if (allRows) showEmpty else true)
          val key = curKey
          buf.clear()

          // feed row i (absolute index) of match mt into each measure
          // accumulator whose symbol set admits the row's classifier
          def newAccs(): Array[Acc] =
            measureArr.map(m => accFor(m, fieldType(m.field)))
          def feed(accs: Array[Acc], mt: Match, i: Int): Unit = {
            val ci = mt.cls(i - mt.start)
            var x = 0
            while (x < measureArr.length) {
              val want = wantSets(x)
              if (want == null || (ci >= 0 && want(ci))) {
                val m = measureArr(x)
                val v =
                  if (m.agg == "classifier") { if (ci >= 0) symNames(ci) else null }
                  else if (m.agg == "count") null // counts rows, value unused
                  else rows(i).get(fieldIdx(m.field))
                accs(x).add(v)
              }
              x += 1
            }
          }
          def finalVals(mt: Match): Array[Any] = {
            val accs = newAccs()
            var i = mt.start
            while (i < mt.end) { feed(accs, mt, i); i += 1 }
            accs.map(_.value)
          }

          if (allRows) {
            val matched = ms.iterator.zipWithIndex.flatMap { case (mt, mn) =>
              if (mt.end == mt.start)
                // SHOW EMPTY MATCHES: one row from the starting row —
                // its own match number, NULL classifier, measures over
                // the empty row set (COUNT 0, aggregates null)
                Iterator.single(Row.fromSeq(key ++
                  orderIdx.map(rows(mt.start).get) ++
                  Seq((mn + 1).toLong, null) ++ newAccs().map(_.value)))
              else {
                // FINAL measures are per-match constants (one extra
                // pass); RUNNING measures read their accumulator after
                // each row
                val fin = if (anyFinal) finalVals(mt) else null
                val runAccs = if (anyRunning) newAccs() else null
                (mt.start until mt.end).iterator.flatMap { i =>
                  // excluded rows ({- -}) still FEED running measures
                  // (exclusion is output suppression only) but emit no
                  // output row
                  if (runAccs != null) feed(runAccs, mt, i)
                  if (mt.excl != null && mt.excl(i - mt.start)) Iterator.empty
                  else {
                    val ci = mt.cls(i - mt.start)
                    val mvals = measureArr.indices.map { x =>
                      if (measureArr(x).running) runAccs(x).value else fin(x)
                    }
                    Iterator.single(Row.fromSeq(key ++ orderIdx.map(rows(i).get) ++
                      Seq((mn + 1).toLong, if (ci >= 0) symNames(ci) else null) ++ mvals))
                  }
                }
              }
            }
            if (!withUnmatched) matched
            else {
              // WITH UNMATCHED ROWS: every row in no match (and not an
              // empty-match start) also emits — NULL match_num,
              // classifier and measures (the standard's totality mode)
              val covered = new Array[Boolean](rows.length)
              ms.foreach { mt =>
                if (mt.end == mt.start) covered(mt.start) = true
                else { var i = mt.start; while (i < mt.end) { covered(i) = true; i += 1 } }
              }
              val nullMeasures = measureArr.map(_ => null)
              matched ++ (0 until rows.length).iterator
                .filter(i => !covered(i))
                .map(i => Row.fromSeq(key ++ orderIdx.map(rows(i).get) ++
                  Seq(null, null) ++ nullMeasures))
            }
          }
          else ms.iterator.zipWithIndex.map { case (mt, mn) =>
            // empty matches summarize like any other: COUNT 0,
            // aggregates null (finalVals over an empty span)
            Row.fromSeq(key ++ Seq((mn + 1).toLong) ++ finalVals(mt))
          }
        }
      }

      // guards the prePartitioned contract WITHIN this partition: if a
      // key reappears after its group was emitted, the input was NOT
      // clustered by the partition keys — matches would be computed on
      // fragments and match_num would restart, silently wrong. Fail
      // loudly instead. Scope limit: a key split ACROSS partitions is
      // invisible here (each task sees a clean run) — that case needs
      // the caller-side validatePrePartitioned check.
      val closed = scala.collection.mutable.HashSet[Seq[Any]]()
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private def advance(): Unit = {
          while (!pending.hasNext && iter.hasNext) {
            val r = iter.next()
            val k = keyIdx.map(r.get).toSeq
            if (curKey == null) curKey = k
            if (k != curKey) {
              if (!closed.add(curKey))
                sys.error(s"matchPattern: key group $curKey fragmented — input is not " +
                  "clustered by the partition keys (broken prePartitioned contract?)")
              pending = emitGroup(); curKey = k; buf += r
            } else buf += r
          }
          if (!pending.hasNext && !iter.hasNext && buf.nonEmpty) {
            if (!closed.add(curKey))
              sys.error(s"matchPattern: key group $curKey fragmented — input is not " +
                "clustered by the partition keys (broken prePartitioned contract?)")
            pending = emitGroup()
          }
        }
        def hasNext: Boolean = { advance(); pending.hasNext }
        def next(): Row = { advance(); pending.next() }
      }
    }(Encoders.row(outSchema))
  }
}
