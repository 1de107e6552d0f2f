package graft.serve

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Async SQL execution service — the engine-side equivalent of walden's
  * Superset SQL Lab async path (browser -> Celery queue -> worker ->
  * Redis result cache; `tf/superset/superset.tf:52-70`,
  * `tf/superset/superset_config.py:36-75`). One process, same
  * semantics: bounded worker pool, query status lifecycle, TTL'd
  * result cache keyed by a canonicalized analyzed-plan fingerprint
  * (whitespace/comment/alias variants hit; different literals miss),
  * per-service feature flags (allow_ctas / allow_cvas / allow_dml
  * parity).
  *
  * User impersonation (walden sets `impersonate_user: true` on the
  * Superset DB — `tf/superset/superset.tf:60`): every submission
  * carries a user identity; each user executes in an isolated child
  * SparkSession (own temp-view namespace + `spark.graft.user` conf),
  * `onUserSession` runs once per user to install per-user views /
  * row filters, and the result cache is keyed per user so one user's
  * results are never served to another.
  *
  * Results are collected only up to `maxResultRows` (BI-shaped
  * consumption); full-size outputs should INSERT/CTAS instead — same
  * discipline Superset imposes on SQL Lab.
  */
final class QueryService(
    spark: SparkSession,
    workers: Int = 4,
    cacheTtlSeconds: Long = 300, // walden CACHE_DEFAULT_TIMEOUT=300s
    maxResultRows: Int = 10000,
    allowCtas: Boolean = true,
    allowCvas: Boolean = true,
    allowDml: Boolean = true,
    onUserSession: (SparkSession, String) => Unit = (_, _) => (),
    maxUserSessions: Int = 256,
    maxTrackedQueries: Int = 10000,
    maxQuerySeconds: Long = 600, // walden SQLLAB_ASYNC_TIME_LIMIT_SEC
    policies: Map[String, QueryService.TablePolicy] = Map.empty) extends AutoCloseable {
  require(maxUserSessions > 0, s"maxUserSessions must be positive, got $maxUserSessions")
  require(maxTrackedQueries > 0, s"maxTrackedQueries must be positive, got $maxTrackedQueries")

  // Policy routing (round 12, r11 verdict #5): a DOTTED policy key
  // names a catalog table (`g.db.t`) — a temp view cannot shadow that
  // name, so those policies enforce through the analyzer rule
  // (PolicyEnforcementRule, registered JVM-wide, scoped to this
  // service's namespace). Undotted keys keep the round-11 per-user
  // VIEW rewrite. Both paths push the predicate into the scan.
  private val (catalogPolicies, viewPolicies) =
    policies.partition { case (name, _) => name.contains(".") }
  private val policyNamespace = s"graft-service-${QueryService.nextServiceId.incrementAndGet()}"
  if (catalogPolicies.nonEmpty)
    PolicyEnforcement.install(policyNamespace, catalogPolicies)

  sealed trait Status
  case object Queued extends Status
  case object Running extends Status
  final case class Finished(rows: Seq[Row], columns: Seq[String],
      elapsedMs: Long, fromCache: Boolean) extends Status
  final case class Failed(error: String) extends Status
  /** Terminal: stopped by [[cancel]] or the execution-limit reaper. */
  final case class Cancelled(reason: String) extends Status

  private val pool = Executors.newFixedThreadPool(workers)
  private val nextId = new AtomicLong(0)
  private val statuses = new ConcurrentHashMap[Long, Status]()
  private val cache = new ConcurrentHashMap[String, (Long, Finished)]() // key -> (expiryMs, result)

  /** Terminal-status retention (round 11, r10 verdict #7): the
    * reference stores async results in a TTL'd backend — an unbounded
    * status map would leak one Finished (up to maxResultRows rows) per
    * query FOREVER at the 100-task/s service rate. Terminal statuses
    * enqueue FIFO and the oldest evict past `maxTrackedQueries`;
    * `status()` on an evicted id reads None and `await()` reports it
    * by name — the results-expire contract SQL Lab users already
    * have. Queued/Running entries are never evicted (the queue holds
    * only terminal ids). */
  private val terminalOrder = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  // counted separately: statuses.size() includes Queued/Running, and
  // sizing eviction from it would let a backlog >= cap evict every
  // result the instant it lands (review r11); ConcurrentLinkedQueue
  // .size() is O(n), hence the explicit counter
  private val terminalCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val lastCacheSweepMs = new AtomicLong(0)
  private def putTerminal(id: Long, st: Status): Unit = {
    // count an id once even if two paths go terminal (a queued cancel
    // racing the worker's own completion) — double-enqueueing would
    // drift the counter and shrink retention
    val prev = statuses.put(id, st)
    val firstTerminal = prev == null || prev == Queued || prev == Running
    if (!firstTerminal) return
    terminalOrder.add(id)
    var over = terminalCount.incrementAndGet() - maxTrackedQueries
    while (over > 0) {
      val old = terminalOrder.poll()
      if (old == null) over = 0
      else { statuses.remove(old); terminalCount.decrementAndGet(); over -= 1 }
    }
    // the result cache is TTL-bounded but only swept opportunistically
    // (cacheSize): sweep on write once it outgrows the tracking cap,
    // at most once per second — an unexpired over-cap cache would
    // otherwise pay a full O(cache) scan per completion
    if (cache.size() > maxTrackedQueries) {
      val now = System.currentTimeMillis()
      val prev = lastCacheSweepMs.get()
      if (now - prev > 1000 && lastCacheSweepMs.compareAndSet(prev, now)) cacheSize
    }
  }

  /** One isolated child session per user: shared catalog + cached data,
    * private temp-view namespace and conf (the execution-identity
    * boundary Spark offers in-process). Created lazily; onUserSession
    * installs the user's views once per residency. LRU-bounded
    * (`maxUserSessions`): user is an arbitrary caller-supplied string,
    * so an unbounded map would let identity churn grow driver memory
    * without limit. Eviction drops the user's session state (temp
    * views a user created via CVAS are rebuilt by onUserSession on the
    * next touch, not preserved — size the cap for the real user
    * population if that matters) AND purges the user's result-cache
    * entries, so a stale cached read can never outlive the views it
    * was computed from. Cleared on close(). */
  private val userSessions =
    new java.util.LinkedHashMap[String, SparkSession](16, 0.75f, true)
  private def dropUserCache(user: String): Unit = {
    val prefix = s"${user.length}:$user:"
    cache.keySet.asScala.filter(_.startsWith(prefix)).foreach(cache.remove)
  }
  // per-user creation locks: session build runs the embedder's
  // onUserSession callback (arbitrarily slow) — holding the single map
  // monitor there would serialize every not-yet-resident user's first
  // query behind it. Each entry is removed once its session is
  // resident, so identity churn cannot grow this map without bound.
  private val userLocks = new ConcurrentHashMap[String, Object]()
  private def sessionFor(user: String): SparkSession =
    // the service identity runs on the embedder's own session (its temp
    // views are the service's working set); impersonated users each get
    // an isolated child session
    if (user == "anonymous") spark
    else {
      val hit = userSessions.synchronized(userSessions.get(user))
      if (hit != null) hit
      else {
        val result = userLocks.computeIfAbsent(user, _ => new Object).synchronized {
          val again = userSessions.synchronized(userSessions.get(user))
          if (again != null) again
          else {
            val s = spark.newSession()
            s.conf.set(PolicyEnforcement.UserConf, user)
            // point the child session at THIS service's catalog-table
            // policies BEFORE onUserSession: any SQL the embedder runs
            // there is already policied
            if (catalogPolicies.nonEmpty)
              s.conf.set(PolicyEnforcement.NamespaceConf, policyNamespace)
            onUserSession(s, user)
            applyPolicies(s, user)
            // fail CLOSED, not silent-open (round-12 review finding): a
            // dotted policy that never matches a DSv2 relation (catalog
            // typo, Hive/session-catalog table) would otherwise leave
            // the table readable RAW by every impersonated user
            catalogPolicies.keys.foreach { t =>
              val analyzed =
                try s.table(t).queryExecution.analyzed
                catch {
                  case e: Exception => throw new IllegalStateException(
                    s"catalog policy for '$t' cannot be enforced in user '$user' " +
                      s"session: ${e.getMessage}", e)
                }
              val enforced = analyzed.exists {
                case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
                  r.options.containsKey(PolicyEnforcement.AppliedOption)
                case _ => false
              }
              if (!enforced) throw new IllegalStateException(
                s"catalog policy for '$t' did not attach: dotted policy names must " +
                  "resolve to a DSv2 catalog relation whose catalog.namespace.name " +
                  "equals the policy key (session-catalog/Hive tables take the " +
                  "undotted per-user view-policy path)")
            }
            // manual LRU eviction: find the eldest under the monitor,
            // purge its cache entries OUTSIDE it — a full cache scan
            // under the map monitor would serialize every session
            // lookup behind it
            val evicted = userSessions.synchronized {
              userSessions.put(user, s)
              if (userSessions.size > maxUserSessions) {
                val it = userSessions.keySet.iterator
                val eldest = it.next(); it.remove(); Some(eldest)
              } else None
            }
            evicted.foreach(dropUserCache)
            s
          }
        }
        userLocks.remove(user)
        result
      }
    }

  /** Row-level security + column masking (Superset's RLS/masking
    * surface, applied engine-side): after `onUserSession` registers a
    * user's base views, each policied view is REPLACED in that child
    * session by a filtered/masked projection of itself. The rewrite is
    * per-session, so the user cannot reach the unfiltered relation by
    * name — and because it happens at VIEW level, Catalyst pushes the
    * predicate into the scan like any other filter (no per-row UDF
    * tax). The service identity ("anonymous", the embedder's own
    * session) is trusted and unpolicied. Eviction rebuilds rerun this,
    * so a policy survives session churn; result-cache keys are already
    * per-user, so a filtered result can never serve another user. */
  private def applyPolicies(s: SparkSession, user: String): Unit =
    viewPolicies.foreach { case (table, pol) =>
      val base =
        try s.table(table)
        catch {
          case e: Exception => throw new IllegalStateException(
            s"policy configured for '$table' but onUserSession did not " +
              s"register it for user '$user'", e)
        }
      val unknown = pol.columnMasks.keySet -- base.columns.toSet
      require(unknown.isEmpty,
        s"policy for '$table' masks non-existent column(s): ${unknown.mkString(", ")}")
      val masked = base.columns.map { c =>
        pol.columnMasks.get(c) match {
          case Some(m) => s"($m) AS `$c`"
          case None => s"`$c`"
        }
      }
      val filtered = pol.rowFilter(user) match {
        case Some(pred) => base.filter(org.apache.spark.sql.functions.expr(pred))
        case None => base
      }
      filtered.selectExpr(masked.toIndexedSeq: _*).createOrReplaceTempView(table)
    }

  /** True iff `sess` is still the resident session for `user` — guards
    * cache writes: a query that ran on a since-evicted session must not
    * publish its result after the eviction already purged that user's
    * cache (the views it was computed from are gone). */
  private def stillResident(user: String, sess: SparkSession): Boolean =
    user == "anonymous" || (userSessions.synchronized(userSessions.get(user)) eq sess)

  /** Lowercased/collapsed form for PREFIX CLASSIFICATION ONLY — never
    * a cache key: collapsing inside string literals would make
    * `name='ALICE'` and `name='alice'` collide. Comments are stripped
    * FIRST (quote-aware): collapsing `-- note (\n` into one line would
    * otherwise let comment text (and its parens) corrupt the
    * classification that the DML gate hangs off. */
  private def classify(sql: String): String =
    stripComments(sql).trim.replaceAll("\\s+", " ").toLowerCase

  /** Remove `-- ...\n` and balanced `/* ... */` comments outside string
    * literals / quoted identifiers, honoring backslash escapes (Spark's
    * default string literal syntax). Twin scanner:
    * `TrinoDialect.splitStatements` lexes the same comment grammar but
    * PRESERVES text instead of removing it — a comment-lexing fix here
    * usually applies there too. */
  private def stripComments(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    var quote = ' '
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != ' ') {
        out.append(c)
        if (c == '\\' && quote != '`' && i + 1 < sql.length) {
          out.append(sql.charAt(i + 1)); i += 1 // escaped char inside literal
        } else if (c == quote) quote = ' '
        i += 1
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1 // line comment
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        // bracketed comments NEST in Spark's lexer (SQL standard), so
        // track depth — stopping at the first */ would leave a tail
        // like `c */ INSERT ...` that Spark still treats as comment,
        // hiding the INSERT from the DML gate
        var cdepth = 1
        i += 2
        while (i < sql.length && cdepth > 0) {
          if (i + 1 < sql.length && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
            cdepth += 1; i += 2
          } else if (i + 1 < sql.length && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
            cdepth -= 1; i += 2
          } else i += 1
        }
        out.append(' ')
      } else {
        if (c == '\'' || c == '"' || c == '`') quote = c
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Cache key body: a fingerprint of the CANONICALIZED ANALYZED plan
    * (SURVEY §4's normalized-plan key — r6 verdict #5). Whitespace,
    * comment, and alias variants of the same query share a fingerprint
    * (canonicalization strips alias names and normalizes attribute
    * ids); different literals produce different plans and miss. Views
    * are already inlined in the analyzed plan, so a per-user view
    * resolving differently yields a different fingerprint by
    * construction — on top of the per-user key prefix. MD5 plus the
    * canonical text's length: a 128-bit digest collision would serve
    * another query's rows, so the length rides along as a second
    * independent check. */
  private def planFingerprint(df: DataFrame, original: String): String = {
    // OPTIMIZED plan, not analyzed: CTERelationDef ids are fresh per
    // query and survive canonicalization, so an analyzed-plan key
    // would never hit for `WITH ...` statements — the optimizer
    // inlines CTEs (and folds constants, which only widens the hit
    // class to value-identical plans)
    val canon = df.queryExecution.optimizedPlan.canonicalized.toString
    val body =
      if (opaquePlanState.matcher(canon).find()) {
        // the plan embeds object state whose toString is an instance
        // identity hash — typed-operator lambdas (MATCH_RECOGNIZE's
        // matcher MapPartitions), Array/binary literals. The canonical
        // text is then UNSTABLE across submissions of the same query
        // (no repeat ever hits), and with the hashes stripped it could
        // COLLIDE across different queries sharing a lambda call site
        // but capturing different closure state (two MR specs over the
        // same input). Key on normalized TEXT instead: comment-strip +
        // keyword-case-fold + whitespace-collapse OUTSIDE literals
        // (classify() also folds literal case/whitespace, fine for a
        // gate but a cache key must distinguish 'Bob' from 'bob').
        "txt:" + normalizeOutsideLiterals(stripComments(original).trim)
      } else canon
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$md5:${body.length}"
  }

  /** Instance-identity toStrings inside a canonical plan: `...@hex`. */
  private val opaquePlanState = java.util.regex.Pattern.compile("@[0-9a-f]{4,}")

  /** Lowercase and collapse whitespace runs OUTSIDE string literals /
    * quoted identifiers (same quote grammar as [[stripComments]]), so
    * keyword-case and whitespace variants of an opaque-plan query share
    * a text key without merging case- or space-distinct literals. */
  private[graft] def normalizeOutsideLiterals(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    var quote = ' '
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != ' ') {
        out.append(c)
        if (c == '\\' && quote != '`' && i + 1 < sql.length) {
          out.append(sql.charAt(i + 1)); i += 1
        } else if (c == quote) quote = ' '
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; out.append(c); i += 1
      } else if (c.isWhitespace) {
        out.append(' ')
        while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      } else {
        out.append(c.toLower); i += 1
      }
    }
    out.toString
  }

  /** Strip a leading CTE list from a classify()-normalized statement so
    * `WITH t AS (...) INSERT INTO ...` classifies (and gates, and
    * caches) as its MAIN statement, not as a read-only `with`. Walks
    * parens outside string literals; a `name (cols) AS (...)` column
    * list is recognized by the `as` that follows its closing paren. */
  private[graft] def mainStatement(n: String): String = {
    if (!n.startsWith("with ")) return n
    var i = 5
    var depth = 0
    var quote = ' ' // inside '…', "…" (identifier) or `…` when non-NUL
    while (i < n.length) {
      val c = n.charAt(i)
      if (quote != ' ') {
        if (c == '\\' && quote != '`') i += 1 // escaped char inside literal
        else if (c == quote) quote = ' '
      }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) {
            var j = i + 1
            while (j < n.length && n.charAt(j) == ' ') j += 1
            val rest = n.substring(j)
            if (rest.startsWith(",")) i = j // next CTE in the list
            else if (rest.startsWith("as ") || rest.startsWith("as(")) () // was a column list
            else return rest // the main statement
          }
        case _ =>
      }
      i += 1
    }
    n
  }

  /** Classify a mainStatement(classify(...))-normalized statement. */
  private def ddlKind(n: String): Option[String] = {
    if (n.startsWith("create table") && n.contains(" as ")) Some("ctas")
    else if (n.startsWith("create view") || n.startsWith("create or replace view") ||
      n.startsWith("create temp view") || n.startsWith("create or replace temp view")) Some("cvas")
    else if (n.startsWith("update ") || n.startsWith("delete ") || n.startsWith("merge ") ||
      n.startsWith("insert ")) Some("dml")
    else None
  }

  /** Submit; returns a query id immediately (Celery-task parity).
    * `user` is the impersonated execution identity. */
  def submit(sql: String, user: String = "anonymous"): Long = {
    val id = nextId.incrementAndGet()
    statuses.put(id, Queued)
    pool.submit(new Runnable {
      override def run(): Unit = execute(id, sql, user)
    })
    id
  }

  def status(id: Long): Option[Status] = Option(statuses.get(id))

  // ---- cancellation (round 11; SQL Lab STOP + the async time limit) --
  // every query's Spark jobs run under the thread-scoped group
  // "graft-q-<id>", so cancel() can kill exactly that query's jobs on
  // the SHARED context without touching neighbors.
  // Spark 4 cancellation rides CONTEXT-level job tags: addJobTag on
  // the worker thread attaches the tag to every job it submits, and
  // cancelJobsWithTag kills matching ACTIVE jobs from ANY thread.
  // (SparkSession.addTag/interruptTag is thread-scoped in classic
  // mode — an interrupt from another thread resolves no operations,
  // measured on this build; the classic setJobGroup likewise failed
  // to reach SQL executions.) cancelJobsWithTag only sees active
  // jobs, so a cancel landing during analysis/codegen is re-fired by
  // the reaper every second until the worker goes terminal. The
  // instance nonce keeps tags globally unique across QueryService
  // instances sharing one context.
  private val instanceNonce = java.lang.Long.toHexString(
    java.util.concurrent.ThreadLocalRandom.current().nextLong())
  private def queryTag(id: Long) = s"graft-$instanceNonce-q-$id"
  private val cancelRequested = ConcurrentHashMap.newKeySet[java.lang.Long]()
  private val cancelReasons = new ConcurrentHashMap[Long, String]()
  private val runningSince = new ConcurrentHashMap[Long, (Long, SparkSession)]()

  /** Stop a queued or running query (walden SQL Lab STOP parity).
    * Queued: terminal immediately, the worker later no-ops. Running:
    * the query's job group is cancelled (tasks interrupt) and the
    * worker reports Cancelled. Returns false for terminal/unknown ids. */
  def cancel(id: Long, reason: String = "cancelled by user"): Boolean =
    statuses.get(id) match {
      case Queued =>
        cancelReasons.put(id, reason)
        cancelRequested.add(id)
        putTerminal(id, Cancelled(reason))
        true
      case Running =>
        cancelReasons.put(id, reason)
        cancelRequested.add(id)
        val r = runningSince.get(id)
        if (r != null) r._2.sparkContext.cancelJobsWithTag(queryTag(id))
        true
      case _ => false
    }

  // execution-limit reaper (walden SQLLAB_ASYNC_TIME_LIMIT_SEC=600):
  // the limit is enforced SERVER-side, not just by await()'s client
  // timeout — a runaway query is killed even if nobody is polling it.
  private val reaper: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-query-reaper"); t.setDaemon(true); t
    })
  // always scheduled: the cancel re-fire must not die with a disabled
  // execution limit (maxQuerySeconds <= 0 turns off only the deadline)
  reaper.scheduleAtFixedRate(new Runnable {
    override def run(): Unit = {
      val deadline =
        if (maxQuerySeconds > 0) System.currentTimeMillis() - maxQuerySeconds * 1000
        else Long.MinValue
      runningSince.forEach { (id, se) =>
        if (se._1 < deadline)
          cancel(id, s"exceeded the ${maxQuerySeconds}s execution limit")
        else if (cancelRequested.contains(id))
          se._2.sparkContext.cancelJobsWithTag(queryTag(id)) // re-fire until terminal
      }
    }
  }, 1, 1, TimeUnit.SECONDS)

  /** Block until the query reaches a terminal state. An id evicted by
    * the retention cap (or never issued) fails BY NAME instead of
    * burning the whole timeout polling a key that can never appear. */
  def await(id: Long, timeoutMs: Long = 600000): Status = { // walden report time limit 600s
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      statuses.get(id) match {
        case f: Finished => return f
        case f: Failed => return f
        case c: Cancelled => return c
        case null => return Failed(
          s"query $id is unknown or its result was evicted (results are " +
            s"retained for the newest $maxTrackedQueries queries)")
        case _ => Thread.sleep(10)
      }
    }
    Failed(s"timeout after ${timeoutMs}ms")
  }

  /** Synchronous convenience (SQL Lab sync path). */
  def sql(text: String, user: String = "anonymous"): Status = await(submit(text, user))

  /** Read-only statement prefixes — the ONLY cacheable class. An
    * unrecognized statement (DROP, ALTER, REFRESH, plain CREATE ...)
    * must re-execute every time: serving it from cache would silently
    * skip its side effects. */
  private val readPrefixes =
    Seq("select", "with", "values", "show", "describe", "desc ", "explain", "table ")

  private def execute(id: Long, sql: String, user: String): Unit = {
    // cancelled while queued: cancel() already went terminal; no-op
    if (cancelRequested.remove(id)) { cancelReasons.remove(id); return }
    try {
      // one normalization pass feeds both the gate and cache-eligibility
      val main = mainStatement(classify(sql))
      ddlKind(main).foreach {
        case "ctas" if !allowCtas => throw new IllegalStateException("CTAS disabled (allow_ctas=false)")
        case "cvas" if !allowCvas => throw new IllegalStateException("CVAS disabled (allow_cvas=false)")
        case "dml" if !allowDml => throw new IllegalStateException("DML disabled (allow_dml=false)")
        case _ =>
      }
      // conditional transition: a queued-cancel that won the race
      // already went terminal — never overwrite Cancelled with Running
      if (!statuses.replace(id, Queued, Running)) {
        cancelRequested.remove(id); cancelReasons.remove(id); return
      }
      val t0 = System.nanoTime()
      val sess = sessionFor(user)
      runningSince.put(id, (System.currentTimeMillis(), sess))
      // thread-scoped: every job this worker thread submits for THIS
      // query carries the tag, so cancelJobsWithTag kills exactly this
      // query's jobs on the shared context
      sess.sparkContext.addJobTag(queryTag(id))
      // closed the register-then-cancel race: a cancel() that saw
      // Running but missed runningSince finds it on the recheck
      if (cancelRequested.contains(id)) throw new InterruptedException("cancelled")
      // cache only provably read-only statements (positive whitelist);
      // the MAIN statement so a CTE-prefixed INSERT/UPDATE/DELETE/MERGE
      // is never served from cache (its side effect must run every
      // time). The key runs analysis + OPTIMIZATION (planFingerprint
      // reads the optimized plan — see its doc for why analyzed-plan
      // keys can never hit for CTEs): a deliberate trade — optimizer
      // milliseconds buy alias/CTE/constant-fold-invariant hits, and
      // the cache exists for queries whose EXECUTION dwarfs planning.
      // Neither triggers execution for the whitelisted prefixes (read
      // statements are lazy; SHOW/DESCRIBE command execution is itself
      // read-only).
      // Cache keyed per user besides the fingerprint: one user's rows
      // must never serve another's even for an identical plan.
      // Length-prefixed so no (user, key) pair can collide.
      val cacheable = readPrefixes.exists(main.startsWith)
      val df: DataFrame = sess.sql(sql)
      val key = if (cacheable) s"${user.length}:$user:${planFingerprint(df, sql)}" else ""
      if (cacheable) {
        val hit = cache.get(key)
        if (hit != null && hit._1 > System.currentTimeMillis()) {
          // canonical-plan equality guarantees value-identical rows but
          // NOT output names (canonicalization strips aliases) — serve
          // the cached rows under THIS query's own column labels
          putTerminal(id, hit._2.copy(fromCache = true, columns = df.columns.toSeq))
          return
        }
        // stampede coalescing (round 11): at the 100-task/s service
        // rate a cold/expired popular key draws a herd of identical
        // misses; only the FIRST becomes the leader, the rest await
        // its in-flight result. Deadlock-free by construction: the
        // inflight entry is created by an already-RUNNING leader (put
        // happens here, not at submit) and the FIFO pool dequeued the
        // leader before any follower, so a follower never awaits a
        // task that cannot progress. Keys are user-prefixed, so
        // coalescing never crosses the impersonation boundary.
        val mine = new java.util.concurrent.CompletableFuture[Finished]()
        val leader = inflight.putIfAbsent(key, mine)
        if (leader != null) {
          // a follower runs no Spark jobs, so a cancel() on it cannot
          // be delivered through job tags — poll the leader in short
          // slices and honor the request directly (review r11)
          val sliceMs = 200L
          val limitMs = if (maxQuerySeconds > 0) maxQuerySeconds * 1000 else Long.MaxValue
          val start = System.currentTimeMillis()
          var fin: Finished = null
          while (fin == null) {
            if (cancelRequested.contains(id))
              throw new InterruptedException("cancelled while coalesced")
            if (System.currentTimeMillis() - start > limitMs)
              throw new java.util.concurrent.TimeoutException(
                s"coalesced wait exceeded the ${maxQuerySeconds}s execution limit")
            try fin = leader.get(sliceMs, java.util.concurrent.TimeUnit.MILLISECONDS)
            catch { case _: java.util.concurrent.TimeoutException => }
          }
          putTerminal(id, fin.copy(fromCache = true, columns = df.columns.toSeq))
          return
        }
        try {
          val fin = runAndCache(df, key, user, sess, t0)
          mine.complete(fin)
          putTerminal(id, fin)
        } catch {
          case e: Throwable => mine.completeExceptionally(e); throw e
        } finally inflight.remove(key)
        return
      }
      executions.incrementAndGet()
      val rows = df.limit(maxResultRows).collect().toSeq
      // a side-effecting statement (DDL/DML/CTAS/CVAS — everything
      // non-cacheable) invalidates this user's cached reads: a
      // replaced temp view or mutated table must not keep serving
      // pre-statement rows for the rest of the TTL (review r11 — the
      // opaque TEXT key cannot see a view redefinition, and even a
      // plan key cannot see DML'd table contents)
      dropUserCache(user)
      putTerminal(id, Finished(rows, df.columns.toSeq,
        (System.nanoTime() - t0) / 1000000L, fromCache = false))
    } catch {
      case e: Throwable =>
        // a cancel-requested query ends Cancelled no matter how the
        // kill surfaced (SparkException from the job-group cancel, an
        // interrupt, or the recheck throw)
        if (cancelRequested.contains(id))
          putTerminal(id, Cancelled(
            cancelReasons.getOrDefault(id, "cancelled")))
        else putTerminal(id, Failed(String.valueOf(e.getMessage)))
    } finally {
      cancelRequested.remove(id)
      cancelReasons.remove(id)
      val r = runningSince.remove(id)
      if (r != null) try r._2.sparkContext.removeJobTag(queryTag(id)) catch { case _: Exception => }
    }
  }

  /** Execute a cacheable read and publish it to the result cache (only
    * if the session we ran on is still the user's resident one —
    * results computed on an evicted session must not outlive the
    * eviction's cache purge). */
  private def runAndCache(df: DataFrame, key: String, user: String,
      sess: SparkSession, t0: Long): Finished = {
    executions.incrementAndGet()
    val rows = df.limit(maxResultRows).collect().toSeq
    val fin = Finished(rows, df.columns.toSeq,
      (System.nanoTime() - t0) / 1000000L, fromCache = false)
    if (stillResident(user, sess))
      cache.put(key, (System.currentTimeMillis() + cacheTtlSeconds * 1000, fin))
    fin
  }

  /** Leader futures for in-flight cacheable misses, keyed like the
    * cache. Entries live only for the leader's execution. */
  private val inflight =
    new ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[Finished]]()

  /** Actual plan executions (not cache/coalesced serves) — the
    * stampede spec's observable. */
  private[graft] val executions = new java.util.concurrent.atomic.AtomicLong()

  def cacheSize: Int = {
    // opportunistic TTL sweep
    val now = System.currentTimeMillis()
    cache.entrySet().asScala.filter(_.getValue._1 <= now).map(_.getKey).foreach(cache.remove)
    cache.size()
  }

  override def close(): Unit = {
    reaper.shutdownNow()
    pool.shutdownNow()
    userSessions.synchronized(userSessions.clear())
    userLocks.clear()
    if (catalogPolicies.nonEmpty) PolicyEnforcement.uninstall(policyNamespace)
  }
}

object QueryService {
  private[serve] val nextServiceId = new AtomicLong(0)

  /** Declarative per-table security policy (round 11): `rowFilter`
    * maps the impersonated user to a SQL predicate over the table's
    * columns (None = unrestricted — a role check lives inside the
    * function), `columnMasks` maps a column name to a SQL expression
    * that REPLACES it in the user's view (it may reference any of the
    * table's columns, e.g. `"concat(substr(email, 1, 2), '***')"`)
    * — Superset's row-level-security + masking surface, enforced
    * inside the engine instead of the BI layer. */
  final case class TablePolicy(
      rowFilter: String => Option[String] = _ => None,
      columnMasks: Map[String, String] = Map.empty)
}

/** Cron-ish recurring query execution — walden's Celery beat schedule
  * (`superset_config.py:57-66`: reports every minute, prune daily),
  * reduced to a JVM scheduler driving the same QueryService.
  */
final class ReportScheduler(service: QueryService) extends AutoCloseable {
  private val timer: ScheduledExecutorService = Executors.newScheduledThreadPool(1)
  private val runCounts = new ConcurrentHashMap[String, AtomicLong]()

  def schedule(name: String, sql: String, everySeconds: Long,
               onResult: Seq[Row] => Unit = _ => ()): Unit = {
    runCounts.putIfAbsent(name, new AtomicLong(0))
    timer.scheduleAtFixedRate(new Runnable {
      override def run(): Unit = {
        service.sql(sql) match {
          case f: service.Finished =>
            runCounts.get(name).incrementAndGet(); onResult(f.rows)
          case _ =>
        }
      }
    }, 0, everySeconds, TimeUnit.SECONDS)
  }

  def runs(name: String): Long = Option(runCounts.get(name)).map(_.get()).getOrElse(0L)
  override def close(): Unit = timer.shutdownNow()
}
