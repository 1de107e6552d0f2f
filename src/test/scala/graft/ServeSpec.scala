package graft

import graft.serve.{QueryService, ReportScheduler}

/** Async query service: Celery/SQL-Lab parity — async lifecycle,
  * result cache TTL, feature flags, scheduler.
  */
class ServeSpec extends SparkSpec {

  test("async submit -> finished with rows; cache hit on repeat") {
    Tables.registerAll(spark, sf())
    val svc = new QueryService(spark, workers = 2, cacheTtlSeconds = 300)
    try {
      val id = svc.submit("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
      svc.await(id) match {
        case f: svc.Finished =>
          assert(f.rows.size == 5 && !f.fromCache && f.columns == Seq("r_regionkey", "r_name"))
        case other => fail(s"unexpected: $other")
      }
      svc.sql("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") match {
        case f: svc.Finished => assert(f.fromCache && f.rows.size == 5)
        case other => fail(s"unexpected: $other")
      }
      assert(svc.cacheSize == 1)
    } finally svc.close()
  }

  test("cache never collides distinct literals and never caches DDL") {
    Tables.registerAll(spark, sf())
    val svc = new QueryService(spark)
    try {
      val a = svc.sql("SELECT count(*) AS n FROM region WHERE r_name = 'AFRICA'") match {
        case f: svc.Finished => f.rows.head.getLong(0); case o => fail(s"$o")
      }
      // same statement, lowercased literal: must NOT be served from cache
      val b = svc.sql("SELECT count(*) AS n FROM region WHERE r_name = 'africa'") match {
        case f: svc.Finished => assert(!f.fromCache); f.rows.head.getLong(0)
        case o => fail(s"$o")
      }
      assert(a == 1L && b == 0L)
      // side-effecting statements re-execute every time
      svc.sql("CREATE OR REPLACE TEMP VIEW cache_probe AS SELECT 1 AS x")
      spark.catalog.dropTempView("cache_probe")
      svc.sql("CREATE OR REPLACE TEMP VIEW cache_probe AS SELECT 1 AS x") match {
        case f: svc.Finished => assert(!f.fromCache); case o => fail(s"$o")
      }
      assert(spark.catalog.tableExists("cache_probe"))
      spark.catalog.dropTempView("cache_probe")
    } finally svc.close()
  }

  test("plan-fingerprint cache: whitespace/comment/alias variants hit, literals miss") {
    Tables.registerAll(spark, sf())
    val svc = new QueryService(spark, cacheTtlSeconds = 300)
    try {
      svc.sql("SELECT r_name, count(*) AS n FROM region WHERE r_regionkey >= 2 GROUP BY r_name") match {
        case f: svc.Finished => assert(!f.fromCache); case o => fail(s"$o")
      }
      // whitespace + comment variant of the SAME query: plan key hits
      svc.sql("""SELECT   r_name, -- a comment
                 count(*)    AS n
                 FROM region    WHERE r_regionkey >= 2
                 GROUP BY r_name""") match {
        case f: svc.Finished => assert(f.fromCache, "whitespace/comment variant must hit")
        case o => fail(s"$o")
      }
      // alias variant (different output NAME, same canonical plan
      // modulo alias): canonicalization strips alias names, so it hits
      svc.sql("SELECT r_name, count(*) AS cnt FROM region WHERE r_regionkey >= 2 GROUP BY r_name") match {
        case f: svc.Finished =>
          assert(f.fromCache, "alias variant must hit")
          // but served under ITS OWN output names, not the first query's
          assert(f.columns == Seq("r_name", "cnt"), f.columns)
        case o => fail(s"$o")
      }
      // different literal: different plan, must miss
      svc.sql("SELECT r_name, count(*) AS n FROM region WHERE r_regionkey >= 3 GROUP BY r_name") match {
        case f: svc.Finished => assert(!f.fromCache, "different literal must miss")
        case o => fail(s"$o")
      }
      assert(svc.cacheSize == 2)
    } finally svc.close()
  }

  test("failures are reported, not thrown") {
    val svc = new QueryService(spark)
    try {
      svc.sql("SELECT * FROM definitely_not_a_table") match {
        case f: svc.Failed => assert(f.error.nonEmpty)
        case other => fail(s"unexpected: $other")
      }
    } finally svc.close()
  }

  test("allow_dml=false blocks INSERT (walden per-DB flag parity)") {
    val svc = new QueryService(spark, allowDml = false)
    try {
      svc.sql("INSERT INTO some_table VALUES (1)") match {
        case f: svc.Failed => assert(f.error.contains("DML disabled"))
        case other => fail(s"unexpected: $other")
      }
    } finally svc.close()
  }

  test("CTE-prefixed DML is gated and never cached") {
    // `WITH ... INSERT` starts with 'with': it must still hit the
    // allow_dml gate and must never be served from cache
    val svc = new QueryService(spark, allowDml = false)
    try {
      svc.sql("WITH src AS (SELECT 1 AS x) INSERT INTO some_table SELECT * FROM src") match {
        case f: svc.Failed => assert(f.error.contains("DML disabled"), f.error)
        case other => fail(s"unexpected: $other")
      }
    } finally svc.close()
    val svc2 = new QueryService(spark)
    try {
      // a CTE with a column list must still classify as a read (the
      // `(a, b)` parens are not the CTE body) and stay cacheable
      svc2.sql("WITH s(a, b) AS (SELECT 1, 2) SELECT a + b AS n FROM s") match {
        case f: svc2.Finished => assert(!f.fromCache && f.rows.head.getInt(0) == 3)
        case o => fail(s"$o")
      }
      svc2.sql("WITH s(a, b) AS (SELECT 1, 2) SELECT a + b AS n FROM s") match {
        case f: svc2.Finished => assert(f.fromCache) // reads still cache
        case o => fail(s"$o")
      }
    } finally svc2.close()
  }

  test("nested bracketed comments cannot hide DML from the gate") {
    // Spark's lexer nests /* */ (SQL standard): a comment like
    // /* a /* b */ c */ swallows the whole prefix, so a naive scanner
    // that stops at the first */ would misclassify the INSERT
    val svc = new QueryService(spark, allowDml = false)
    try {
      svc.sql("/* a /* b */ c */ INSERT INTO some_table VALUES (1)") match {
        case f: svc.Failed => assert(f.error.contains("DML disabled"), f.error)
        case other => fail(s"unexpected: $other")
      }
      svc.sql("-- note ( \nINSERT INTO some_table VALUES (1)") match {
        case f: svc.Failed => assert(f.error.contains("DML disabled"), f.error)
        case other => fail(s"unexpected: $other")
      }
      svc.sql("WITH a AS (\n SELECT 1 AS x -- tally (\n) INSERT INTO t SELECT x FROM a") match {
        case f: svc.Failed => assert(f.error.contains("DML disabled"), f.error)
        case other => fail(s"unexpected: $other")
      }
    } finally svc.close()
  }

  test("impersonation: per-user sessions see distinct data, caches never cross") {
    import org.apache.spark.sql.SparkSession
    // per-user view hook: each user's session gets a `my_orders` view
    // filtered to their own rows (Superset impersonate_user parity)
    val hook = (s: SparkSession, user: String) => {
      val n = if (user == "alice") 3 else 1
      s.range(n).toDF("x").createOrReplaceTempView("my_orders")
      ()
    }
    val svc = new QueryService(spark, onUserSession = hook)
    try {
      def countFor(user: String) = svc.sql("SELECT COUNT(*) AS n FROM my_orders", user) match {
        case f: svc.Finished => (f.rows.head.getLong(0), f.fromCache)
        case o => fail(s"$o")
      }
      assert(countFor("alice") == ((3L, false)))
      assert(countFor("bob") == ((1L, false))) // same SQL, different visibility, no cache bleed
      assert(countFor("alice") == ((3L, true))) // alice's repeat hits HER cache entry
      // execution identity is visible to the session
      svc.sql("SELECT 1 AS one", "alice") match {
        case f: svc.Finished => assert(!f.fromCache); case o => fail(s"$o")
      }
      // the parent session's namespace is untouched by user views
      assert(!spark.catalog.tableExists("my_orders"))
    } finally svc.close()
  }

  test("session eviction rebuilds user views and purges the user's cache") {
    import org.apache.spark.sql.SparkSession
    val calls = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    val hook = (s: SparkSession, u: String) => {
      val n = calls.computeIfAbsent(u, _ => new java.util.concurrent.atomic.AtomicInteger())
        .incrementAndGet()
      s.range(n).toDF("x").createOrReplaceTempView("my_view")
      ()
    }
    val svc = new QueryService(spark, onUserSession = hook, maxUserSessions = 2)
    try {
      def q(user: String) = svc.sql("SELECT COUNT(*) AS n FROM my_view", user) match {
        case f: svc.Finished => (f.rows.head.getLong(0), f.fromCache)
        case o => fail(s"$o")
      }
      assert(q("u1") == ((1L, false)))
      assert(q("u1") == ((1L, true))) // cached while resident
      q("u2"); q("u3") // cap 2 -> evicts u1
      // u1's repeat must NOT see the stale cache (purged on eviction)
      // and the rebuilt session re-ran the hook (2 rows now)
      assert(q("u1") == ((2L, false)))
    } finally svc.close()
  }

  test("thrift endpoint serves JDBC clients (walden's BI wire parity)") {
    val port = 10000 + scala.util.Random.nextInt(20000)
    val server = graft.serve.GraftServer.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server needs a moment to bind
      val deadline = System.currentTimeMillis() + 60000
      var conn: java.sql.Connection = null
      while (conn == null && System.currentTimeMillis() < deadline) {
        try conn = java.sql.DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "graft", "")
        catch { case _: Exception => Thread.sleep(500) }
      }
      assert(conn != null, "could not connect to thrift endpoint")
      try {
        val st = conn.createStatement()
        // plain SQL over a raw parquet path — no session-local state needed
        val rs = st.executeQuery(
          s"SELECT count(*) AS n FROM parquet.`${sf()}/region.parquet`")
        assert(rs.next() && rs.getLong(1) == 5L)
        // graft dialect functions are visible through the wire
        val rs2 = st.executeQuery("SELECT strpos('hello', 'l') AS p")
        assert(rs2.next() && rs2.getInt(1) == 3)
        // the Trino MATCH_RECOGNIZE clause parses THROUGH THE WIRE
        // (r9 verdict #5): the injected parser is session-extension
        // state, so the SQL Lab user typing the clause over JDBC gets
        // the same rewrite as in-process spark.sql — including the
        // round-10 FIRST() classifier-history navigation
        val rs3 = st.executeQuery("""
          SELECT * FROM (
            SELECT * FROM VALUES (1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0),
              (1, 4, 9.0), (2, 1, 5.0), (2, 2, 4.0) AS t(k, seq, v)
          ) MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES FIRST(D.v) AS dip_start, COUNT(D.*) AS n_down,
              LAST(U.v) AS rebound
            ONE ROW PER MATCH
            PATTERN (D+ U)
            DEFINE D AS D.v < PREV(D.v), U AS U.v > FIRST(D.v)
          )""")
        assert(rs3.next(), "MATCH_RECOGNIZE over JDBC returned no rows")
        assert(rs3.getInt("k") == 1 && rs3.getDouble("dip_start") == 8.0 &&
          rs3.getLong("n_down") == 2L && rs3.getDouble("rebound") == 9.0,
          "wrong MATCH_RECOGNIZE row over JDBC")
        assert(!rs3.next(), "k=2 never recovers above its fall start; one row only")
      } finally conn.close()
    } finally server.close()
  }

  test("spark connect endpoint binds and accepts TCP (gRPC wire)") {
    val port = 31000 + scala.util.Random.nextInt(2000)
    val server = graft.serve.GraftServer.startConnect(spark, port)
    try {
      val deadline = System.currentTimeMillis() + 30000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        try {
          val s = new java.net.Socket("localhost", port)
          s.close(); ok = true
        } catch { case _: Exception => Thread.sleep(250) }
      }
      assert(ok, s"connect service did not bind port $port")
      // full round-trip needs the connect-client artifact (not shipped
      // in /opt/spark/jars); the server side + extensions injection is
      // what the engine owns.
    } finally server.close()
  }

  test("scheduler runs recurring reports") {
    Tables.registerAll(spark, sf())
    val svc = new QueryService(spark)
    val sched = new ReportScheduler(svc)
    try {
      @volatile var lastCount = -1L
      sched.schedule("region_count", "SELECT COUNT(*) AS n FROM region", everySeconds = 1,
        rows => lastCount = rows.head.getLong(0))
      val deadline = System.currentTimeMillis() + 30000
      while (sched.runs("region_count") < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(sched.runs("region_count") >= 2)
      assert(lastCount == 5L)
    } finally { sched.close(); svc.close() }
  }
}
