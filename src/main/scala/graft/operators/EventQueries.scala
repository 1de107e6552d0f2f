package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{QueryEntry, Tables}

/** Event-table coverage: time bucketing, sliding windows (batch form of
  * the Structured Streaming plan in graft.streaming), sessionization via
  * window functions, JSON extraction, pivot.
  *
  * events.ts is nanosecond-precision parquet; Spark truncates to µs on
  * read while DuckDB keeps ns — so no query here ever emits a raw
  * timestamp: everything is bucketed/formatted to second granularity or
  * coarser, where both engines agree.
  */
object EventQueries {

  private val D = graft.Parity.D
  private def dsum(c: Column): Column = graft.Parity.dsum(c)
  private def oSum(e: String): String = graft.Parity.oSum(e)

  val entries: Seq[QueryEntry] = Seq(

    // ------------------------------------------------------------------
    QueryEntry("e01_tumbling_hour",
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            dsum(col("value")).as("total_value"),
            (sum(col("value").cast(D)).cast("double") / count(lit(1))).as("avg_value"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some(s"""SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type, COUNT(*) AS n,
        ${oSum("value")} AS total_value,
        ${oSum("value")} / COUNT(*) AS avg_value,
        COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    QueryEntry("e02_sessionization",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .withColumn("sec", unix_timestamp(col("ts")))
          .withColumn("prev", lag(col("sec"), 1).over(w))
          .withColumn("is_new",
            when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH x AS (SELECT user_id,
          CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
          LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT user_id,
          CAST(SUM(CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
          COUNT(*) AS n_events
        FROM x GROUP BY user_id""")),

    // ------------------------------------------------------------------
    QueryEntry("e03_json_extract",
      (s, d) => {
        Tables(s, d, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"),
            (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
        CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
        FROM (SELECT event_type,
          CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k FROM events) t
        GROUP BY event_type""")),

    // ------------------------------------------------------------------
    QueryEntry("e04_pivot",
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0, Seq("click", "error", "purchase", "signup", "view"))
      },
      Some("""SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
        COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY 1""")),

    // ------------------------------------------------------------------
    // Batch twin of the Structured Streaming sliding-window plan
    // (graft.streaming.EventStream): 1h windows sliding 30min.
    QueryEntry("e05_sliding_window",
      (s, d) => {
        Tables(s, d, "events")
          .select(window(col("ts"), "1 hour", "30 minutes").as("w"), col("value"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .select(
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("n"), col("total_value"))
      },
      Some(s"""WITH x AS (SELECT UNNEST([0, 1]) AS off, ts, value FROM events),
        y AS (SELECT TIME_BUCKET(INTERVAL '30 minutes', ts)
                - off * INTERVAL '30 minutes' AS win_start, value FROM x)
        SELECT STRFTIME(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
          COUNT(*) AS n, ${oSum("value")} AS total_value
        FROM y GROUP BY win_start""")),

    // ------------------------------------------------------------------
    // Spark 4 VariantType (SURVEY §2.4 JSON row: VariantType+parse_json
    // is the modern engine-native JSON path — binary-encoded, typed
    // access without per-access string re-parsing; the Trino analogue
    // is the json type). parse_json once, then typed variant_get
    // extraction, missing-path null semantics, and an aggregation over
    // the extracted values.
    QueryEntry("e06_variant",
      (s, d) => {
        Tables(s, d, "events")
          .selectExpr("event_id", "parse_json(props) AS v")
          .selectExpr("event_id",
            "variant_get(v, '$.k', 'int') AS k",
            "variant_get(v, '$.k', 'string') AS ks",
            "variant_get(v, '$.missing', 'int') IS NULL AS miss_is_null")
          .groupBy(expr("CAST(k % 10 AS INT)").as("kb"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            max(col("ks")).as("max_ks"),
            count(when(col("miss_is_null"), 1)).as("n_missing"))
      },
      Some("""WITH x AS (SELECT event_id,
          CAST(JSON_EXTRACT(props, '$.k') AS INT) AS k,
          JSON_EXTRACT_STRING(props, '$.k') AS ks,
          JSON_EXTRACT(props, '$.missing') IS NULL AS miss_is_null
        FROM events)
        SELECT CAST(k % 10 AS INT) AS kb, COUNT(*) AS n,
          CAST(SUM(k) AS BIGINT) AS sum_k,
          MAX(ks) AS max_ks,
          COUNT(CASE WHEN miss_is_null THEN 1 END) AS n_missing
        FROM x GROUP BY 1""")),

    // ------------------------------------------------------------------
    // As-of (point-in-time) join: every event gets the user's most
    // recent purchase AT OR BEFORE it. Oracle is DuckDB's native ASOF
    // LEFT JOIN — our union+window derivation must reproduce it
    // exactly. Timestamps compare at second granularity (ns-vs-µs
    // parity, same rule as e01/e02); the right side is pre-aggregated
    // per (user, sec) to satisfy asofLeft's uniqueness contract.
    QueryEntry("e07_asof_join",
      (s, d) => {
        val src = Tables(s, d, "events")
        val ev = src.select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"))
        val purchases = src.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), unix_timestamp(col("ts")).as("psec"))
          .agg(max(col("value")).as("pval"))
        AsOfJoin.asofLeft(ev, purchases, keys = Seq("user_id"),
          leftTs = "sec", rightTs = "psec")
          .select(col("event_id"), col("user_id"), col("event_type"), col("sec"),
            col("psec").as("last_purchase_sec"), col("pval").as("last_purchase_value"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
            CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec FROM events),
          p AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS psec,
            MAX(value) AS pval
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT e.event_id, e.user_id, e.event_type, e.sec,
          p.psec AS last_purchase_sec, p.pval AS last_purchase_value
        FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.sec >= p.psec""")),

    // ------------------------------------------------------------------
    // Range (interval) join: events landing in the hour AFTER each
    // purchase by the same user — the attribution-window query. Grain
    // binning (RangeJoin) keeps it an equi-join; the oracle states the
    // same join as a plain BETWEEN predicate, which DuckDB's IEJoin
    // evaluates natively. Aggregated per purchase for a compact,
    // hashable result.
    QueryEntry("e08_interval_join",
      (s, d) => {
        val src = Tables(s, d, "events")
        val ev = src.select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"))
        val windows = src.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_timestamp(col("ts")).as("lo"),
            (unix_timestamp(col("ts")) + 3600L).as("hi"))
        RangeJoin.binnedIntervalJoin(ev, windows, keys = Seq("user_id"),
          ptCol = "sec", loCol = "lo", hiCol = "hi", grain = 3600L)
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n_events"),
            count(when(col("event_type") === "error", 1)).as("n_errors"),
            countDistinct(col("event_type")).as("n_types"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
            CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec FROM events),
          p AS (SELECT event_id AS purchase_id, user_id,
            CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS lo,
            CAST(FLOOR(EPOCH(ts)) AS BIGINT) + 3600 AS hi
            FROM events WHERE event_type = 'purchase')
        SELECT p.purchase_id, COUNT(*) AS n_events,
          COUNT(CASE WHEN e.event_type = 'error' THEN 1 END) AS n_errors,
          COUNT(DISTINCT e.event_type) AS n_types
        FROM p JOIN e ON e.user_id = p.user_id AND e.sec BETWEEN p.lo AND p.hi
        GROUP BY p.purchase_id""")),

    // ------------------------------------------------------------------
    // Time-series gap filling + forward fill (round 11) — the "date
    // spine" feature-engineering step every training pipeline over
    // event data needs: per user, EVERY hour bucket between that
    // user's first and last event exists in the output (zero-count
    // hours materialized), and the per-hour value sum carries forward
    // through the gaps (LOCF). SCALE: the spine explodes per-KEY
    // (span/grain rows per user — bounded work proportional to output,
    // no cross-key blowup), the fill is one per-user window pass, and
    // the only exchanges are the per-(user, hour) aggregate's and the
    // window's on user_id. Both engines truncate to hour grain, where
    // Spark's µs and DuckDB's ns timestamps agree (the e01 rule).
    QueryEntry("e09_gapfill",
      (s, d) => {
        val ev = Tables(s, d, "events")
          .withColumn("h", date_trunc("hour", col("ts")))
        val perHour = ev.groupBy(col("user_id"), col("h"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        val spine = ev.groupBy(col("user_id"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(col("user_id"),
            explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(perHour, Seq("user_id", "h"), "left")
          .withColumn("filled_v", last(col("v"), ignoreNulls = true).over(w))
          .select(col("user_id"),
            date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("filled_v"), lit(0.0)).as("filled_value"))
      },
      Some(s"""WITH ev AS (SELECT user_id, DATE_TRUNC('hour', ts) AS h, value FROM events),
          per AS (SELECT user_id, h, COUNT(*) AS n, ${oSum("value")} AS v
            FROM ev GROUP BY 1, 2),
          bounds AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY 1),
          spine AS (SELECT user_id,
            UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
          j AS (SELECT s.user_id, s.h, p.n, p.v
            FROM spine s LEFT JOIN per p ON s.user_id = p.user_id AND s.h = p.h)
          SELECT user_id, STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
            COALESCE(n, 0) AS n,
            COALESCE(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
              AS filled_value
          FROM j""")),

    // ------------------------------------------------------------------
    // Spark's NATIVE gap-based session operator (round 11):
    // `session_window(ts, gap)` — the built-in e02 reconstructs with
    // lag+cumsum — emitted at full per-session grain (start, span,
    // count, value sum). Spark merges an event into the open session
    // iff ts - last < gap (µs precision); the oracle reconstructs the
    // same rule relationally on µs-truncated timestamps (DuckDB's
    // TIMESTAMP is µs, so CAST from the ns parquet matches Spark's
    // read exactly). Session starts are >= gap apart, so
    // second-granularity start strings never collide (the e01 rule).
    QueryEntry("e10_session_window",
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
          .select(col("user_id"),
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            (unix_timestamp(col("w.end")) - unix_timestamp(col("w.start")) - 1800L)
              .as("span_sec"), // w.end = last event + gap; integer-second gap cancels
            col("n_events"), col("total_value"))
      },
      Some(s"""WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value, event_id
            FROM events),
          y AS (SELECT *, EPOCH_US(t) AS us,
            LAG(EPOCH_US(t)) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev
            FROM x),
          z AS (SELECT *, CASE WHEN prev IS NULL OR us - prev >= 1800000000
            THEN 1 ELSE 0 END AS is_new FROM y),
          sess AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
            ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM z)
          SELECT user_id, STRFTIME(MIN(t), '%Y-%m-%d %H:%M:%S') AS session_start,
            CAST(FLOOR(EPOCH(MAX(t))) - FLOOR(EPOCH(MIN(t))) AS BIGINT) AS span_sec,
            COUNT(*) AS n_events, ${oSum("value")} AS total_value
          FROM sess GROUP BY user_id, sid"""))
  )
}
