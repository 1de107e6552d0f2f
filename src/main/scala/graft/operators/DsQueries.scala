package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryEntry, Tables}

/** TPC-DS-shaped coverage (walden default-enables a `tpcds` catalog —
  * `tf/variables.tf:241-244`): the three plan shapes that distinguish
  * DS from the TPC-H-style star queries elsewhere in the corpus —
  * cross-channel fact unions, wide multi-dimension rollups, and
  * sales-vs-returns conditional aggregation — expressed over the same
  * driver tables.
  *
  * Scale notes: every join keys on the fact table's foreign key, so
  * the planner shuffles facts and broadcasts only the genuinely tiny
  * dims (nation/region, by stats — nothing is force-broadcast);
  * rollups are two-phase hash aggregates; the channel union is
  * union-then-aggregate so partial aggregation happens map-side in
  * each channel before the single shuffle.
  */
object DsQueries {

  private def dsum(c: org.apache.spark.sql.Column) = graft.Parity.dsum(c)
  private def oSum(e: String) = graft.Parity.oSum(e)

  val entries: Seq[QueryEntry] = Seq(

    // ------------------------------------------------------------------
    // Cross-channel union (TPC-DS q5/q71 shape): two fact channels —
    // revenue attributed to the CUSTOMER's nation vs the SUPPLIER's
    // nation — unioned and re-aggregated per (nation, channel).
    QueryEntry("d01_channel_union",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val custCh = li
          .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, d, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name"),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), lit("customer").as("channel"), col("rev"))
        val suppCh = li
          .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name"),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), lit("supplier").as("channel"), col("rev"))
        custCh.unionByName(suppCh)
          .groupBy(col("nation"), col("channel"))
          .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
      },
      Some(s"""WITH cust AS (
          SELECT n_name AS nation, 'customer' AS channel,
            l_extendedprice * (1 - l_discount) AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        supp AS (
          SELECT n_name AS nation, 'supplier' AS channel,
            l_extendedprice * (1 - l_discount) AS rev
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey),
        u AS (SELECT * FROM cust UNION ALL SELECT * FROM supp)
        SELECT nation, channel, ${oSum("rev")} AS revenue, COUNT(*) AS n_items
        FROM u GROUP BY nation, channel""")),

    // ------------------------------------------------------------------
    // Wide multi-dimension rollup (TPC-DS q18/q27 shape): fact joined
    // through supplier geography AND part brand, ROLLUP over the
    // 3-level dimension hierarchy with GROUPING() labels.
    QueryEntry("d02_wide_dim_rollup",
      (s, d) => {
        Tables(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_partkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
            col("s_nationkey") === col("n_nationkey"))
          .join(Tables(s, d, "region").select("r_regionkey", "r_name"),
            col("n_regionkey") === col("r_regionkey"))
          .join(Tables(s, d, "part").select("p_partkey", "p_brand"),
            col("l_partkey") === col("p_partkey"))
          // pre-aggregate to the (region, nation, brand) GRAIN before
          // the rollup: ROLLUP plans as an Expand — x4 copies of every
          // input row — so feeding it the fact stream quadruples a
          // corpus-sized decimal aggregation (22.9 s at sf1, honest
          // bench), while the grain is ~5x25x25 rows. Decimal sums and
          // counts are associative, so rolling up the pre-aggregate is
          // value-identical (sum of sums, sum of counts); the double
          // cast happens once at the end, exactly like dsum.
          // EMPTY-INPUT edge (ADVICE r8, accepted delta): rollup over
          // the raw stream (and the DuckDB oracle) emits one grand-
          // total row (n_items=0) on an EMPTY input, while rollup over
          // an empty pre-aggregate emits zero rows; n_items is also
          // nullable here (sum of counts). Benchmark tables are never
          // empty — if this entry ever runs against an empty dir, a
          // 0-vs-1-row diff is THIS, not a regression.
          .groupBy(col("r_name"), col("n_name"), col("p_brand"))
          .agg(sum(col("rev").cast(graft.Parity.D)).as("rev1"),
            count(lit(1)).as("cnt1"))
          .rollup(col("r_name"), col("n_name"), col("p_brand"))
          .agg(sum(col("rev1")).cast("double").as("revenue"),
            sum(col("cnt1")).as("n_items"),
            grouping(col("r_name")).cast("int").as("g_region"),
            grouping(col("n_name")).cast("int").as("g_nation"),
            grouping(col("p_brand")).cast("int").as("g_brand"))
      },
      Some(s"""SELECT r_name, n_name, p_brand,
        ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
        COUNT(*) AS n_items,
        CAST(GROUPING(r_name) AS INT) AS g_region,
        CAST(GROUPING(n_name) AS INT) AS g_nation,
        CAST(GROUPING(p_brand) AS INT) AS g_brand
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY ROLLUP(r_name, n_name, p_brand)""")),

    // ------------------------------------------------------------------
    // Sales vs returns (TPC-DS store_sales/store_returns shape): per
    // market segment, total revenue, returned revenue, return ratio.
    QueryEntry("d03_returns_ratio",
      (s, d) => {
        Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, d, "customer").select("c_custkey", "c_mktsegment"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            dsum(col("rev")).as("total_rev"),
            dsum(when(col("l_returnflag") === "R", col("rev")).otherwise(lit(0.0)))
              .as("return_rev"),
            count(lit(1)).as("n_items"),
            sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"))
          .withColumn("return_ratio",
            round(col("return_rev") / col("total_rev"), 6))
      },
      Some(s"""SELECT c_mktsegment,
        ${oSum("l_extendedprice * (1 - l_discount)")} AS total_rev,
        ${oSum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS return_rev,
        COUNT(*) AS n_items,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        ROUND(${oSum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
          / ${oSum("l_extendedprice * (1 - l_discount)")}, 6) AS return_ratio
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment"""))
,
    // ------------------------------------------------------------------
    // Window-over-aggregate (TPC-DS q47/q57 shape): monthly revenue per
    // nation with previous-month delta and a 3-month moving average —
    // aggregate first (two-phase, one shuffle), THEN window over the
    // small aggregated series partitioned by nation (never a window
    // over raw facts: the aggregate reduces cardinality by orders of
    // magnitude before any ordered state is held).
    QueryEntry("d04_monthly_momentum",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables(s, d, "lineitem")
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, d, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(dsum(col("rev")).as("revenue"))
        val w = Window.partitionBy(col("nation")).orderBy(col("month"))
        monthly
          .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
          .withColumn("delta", round(col("revenue") - coalesce(col("prev_rev"), col("revenue")), 6))
          .withColumn("ma3", round(avg(col("revenue")).over(w.rowsBetween(-2, 0)), 6))
          .select(col("nation"), col("month"), col("revenue"), col("delta"), col("ma3"))
      },
      Some(s"""WITH monthly AS (
          SELECT n_name AS nation, STRFTIME(o_orderdate, '%Y-%m') AS month,
            ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2)
        SELECT nation, month, revenue,
          ROUND(revenue - COALESCE(LAG(revenue) OVER w, revenue), 6) AS delta,
          ROUND(AVG(revenue) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
        FROM monthly
        WINDOW w AS (PARTITION BY nation ORDER BY month)""")),

    // ------------------------------------------------------------------
    // Top-k per group over joined facts (TPC-DS q3/q42 shape): rank
    // parts by revenue within each brand, keep the top 3 — dense_rank
    // over the aggregated (brand, part) series, never over raw facts.
    QueryEntry("d05_topk_per_brand",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val agg = Tables(s, d, "lineitem")
          .select(col("l_partkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .join(Tables(s, d, "part").select("p_partkey", "p_brand", "p_name"),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_name"))
          .agg(dsum(col("rev")).as("revenue"))
        agg.withColumn("rk", dense_rank().over(
            Window.partitionBy(col("p_brand"))
              .orderBy(col("revenue").desc, col("p_name"))))
          .filter(col("rk") <= 3)
          .select(col("p_brand"), col("p_name"), col("revenue"), col("rk"))
      },
      Some(s"""WITH agg AS (
          SELECT p_brand, p_name, ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2)
        SELECT p_brand, p_name, revenue, rk FROM (
          SELECT *, DENSE_RANK() OVER (PARTITION BY p_brand
            ORDER BY revenue DESC, p_name) AS rk
          FROM agg) t
        WHERE rk <= 3""")),

    // ------------------------------------------------------------------
    // Channel-intersection on DISTINCT buyer sets (TPC-DS q97 shape):
    // customers who ordered in 1994 vs 1995, full-outer-joined to count
    // both/left-only/right-only. Each side reduces to a distinct-key
    // set BEFORE the join (two-phase distinct, one shuffle per side);
    // the join keys on the already-distinct custkey so the outer join
    // is hash-colocated, never fact-sized.
    QueryEntry("d06_channel_intersect",
      (s, d) => {
        val o = Tables(s, d, "orders").select(col("o_custkey"), col("o_orderdate"))
        val early = o.filter(col("o_orderdate").between("1994-01-01", "1994-12-31"))
          .select(col("o_custkey").as("ck1")).distinct()
        val late = o.filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
          .select(col("o_custkey").as("ck2")).distinct()
        early.join(late, col("ck1") === col("ck2"), "full_outer")
          .agg(
            sum(when(col("ck1").isNotNull && col("ck2").isNotNull, 1).otherwise(0))
              .as("both_years"),
            sum(when(col("ck2").isNull, 1).otherwise(0)).as("only_1994"),
            sum(when(col("ck1").isNull, 1).otherwise(0)).as("only_1995"))
      },
      Some("""WITH early AS (
          SELECT DISTINCT o_custkey AS ck1 FROM orders
          WHERE o_orderdate BETWEEN DATE '1994-01-01' AND DATE '1994-12-31'),
        late AS (
          SELECT DISTINCT o_custkey AS ck2 FROM orders
          WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31')
        SELECT
          CAST(SUM(CASE WHEN ck1 IS NOT NULL AND ck2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_years,
          CAST(SUM(CASE WHEN ck2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1994,
          CAST(SUM(CASE WHEN ck1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1995
        FROM early FULL OUTER JOIN late ON ck1 = ck2""")),

    // ------------------------------------------------------------------
    // Basket co-occurrence via fact SELF-JOIN (market-basket shape —
    // the one join topology d01–d06 don't cover): brand pairs appearing
    // on the same order, top pairs by support. The self-join keys on
    // l_orderkey, so both sides shuffle on the same key once and the
    // pair blow-up is bounded by the per-order line count (≤7 in
    // TPC-H), NOT by brand popularity — per-order output is C(7,2)
    // worst case, skew-safe at any corpus size. Brands are deduped
    // per order BEFORE pairing to cut the pair space.
    QueryEntry("d07_basket_pairs",
      (s, d) => {
        val ob = Tables(s, d, "lineitem").select("l_orderkey", "l_partkey")
          .join(Tables(s, d, "part").select("p_partkey", "p_brand"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b")).distinct()
        val a = ob.select(col("ok"), col("b").as("b1"))
        val bb = ob.select(col("ok").as("ok2"), col("b").as("b2"))
        // r14: hash self-join (guide §3.1) — the pair blow-up is bounded
        // per order, but SMJ was re-sorting BOTH copies of the deduped
        // (order, brand) stream on the order key; a hash build on one
        // side drops both sorts. Rows identical (strategy only).
        a.join(bb.hint("SHUFFLE_HASH"), col("ok") === col("ok2") && col("b1") < col("b2"))
          .groupBy(col("b1"), col("b2"))
          .agg(count(lit(1)).as("support"))
          .orderBy(col("support").desc, col("b1"), col("b2"))
          .limit(20)
      },
      Some("""WITH ob AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand AS b
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT a.b AS b1, c.b AS b2, COUNT(*) AS support
        FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
        GROUP BY 1, 2
        ORDER BY support DESC, b1, b2
        LIMIT 20""")),

    // ------------------------------------------------------------------
    // Aggregate-vs-group-average HAVING (TPC-DS q1 shape): customers
    // whose total return revenue exceeds 1.2x their nation's average.
    // Aggregate to per-customer totals first (one fact shuffle), window
    // the nation average over the ALREADY-AGGREGATED series (customer-
    // cardinality state, never fact-sized), filter. One exchange for
    // the agg, one for the nation window — both on reduced data.
    QueryEntry("d08_above_nation_avg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val perCust = Tables(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, d, "customer").select("c_custkey", "c_name", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
          .agg(dsum(col("rev")).as("ret_rev"))
        // nation_avg via decimal-sum/count, NOT avg-over-doubles: the
        // filter compares against a float boundary, so both engines
        // must derive bit-identical doubles (exact decimal sum, one
        // division) or a 1-ulp summation-order delta could flip a row.
        val w = Window.partitionBy(col("c_nationkey"))
        perCust
          .withColumn("nation_avg",
            sum(col("ret_rev").cast(graft.Parity.D)).over(w).cast("double")
              / count(lit(1)).over(w))
          .filter(col("ret_rev") > col("nation_avg") * 1.2)
          .select(col("c_custkey"), col("c_name"),
            round(col("ret_rev"), 6).as("ret_rev"),
            round(col("nation_avg"), 6).as("nation_avg"))
      },
      Some(s"""WITH per_cust AS (
          SELECT c_custkey, c_name, c_nationkey,
            ${oSum("l_extendedprice * (1 - l_discount)")} AS ret_rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE l_returnflag = 'R'
          GROUP BY 1, 2, 3),
        w AS (
          SELECT *,
            CAST(SUM(CAST(ret_rev AS DECIMAL(38,6))) OVER (PARTITION BY c_nationkey) AS DOUBLE)
              / COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_avg
          FROM per_cust)
        SELECT c_custkey, c_name, ROUND(ret_rev, 6) AS ret_rev,
          ROUND(nation_avg, 6) AS nation_avg
        FROM w WHERE ret_rev > nation_avg * 1.2""")),

    // ------------------------------------------------------------------
    // WINDOW OVER ROLLUP (TPC-DS q36 shape, round 14): revenue rolled
    // up over the (region, nation) hierarchy, then RANK() WITHIN each
    // hierarchy level — nations ranked inside their region, regions
    // ranked against regions, partitioned by the GROUPING() level and
    // the parent key exactly as q36 does. Same Expand-economy as d02:
    // pre-aggregate to the (region, nation) grain before the rollup
    // (sum-of-sums is value-identical), so the x3 Expand copies grain
    // rows, not facts; the window then runs over ~130 rollup rows —
    // never fact-sized ordered state. COALESCE(n_name, '') breaks
    // revenue ties deterministically on both engines.
    QueryEntry("d09_window_over_rollup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val grain = Tables(s, d, "lineitem")
          .select(col("l_suppkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
            col("s_nationkey") === col("n_nationkey"))
          .join(Tables(s, d, "region").select("r_regionkey", "r_name"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(col("rev").cast(graft.Parity.D)).as("rev1"),
            count(lit(1)).as("cnt1"))
        val rolled = grain.rollup(col("r_name"), col("n_name"))
          .agg(sum(col("rev1")).cast("double").as("revenue"),
            sum(col("cnt1")).as("n_items"),
            grouping(col("r_name")).cast("int").as("g_region"),
            grouping(col("n_name")).cast("int").as("g_nation"))
        val w = Window
          .partitionBy(col("g_region") + col("g_nation"),
            when(col("g_nation") === 0, col("r_name")))
          .orderBy(col("revenue").desc, coalesce(col("n_name"), lit("")))
        rolled.withColumn("rk", rank().over(w))
      },
      Some(s"""WITH rolled AS (
          SELECT r_name, n_name,
            ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
            COUNT(*) AS n_items,
            CAST(GROUPING(r_name) AS INT) AS g_region,
            CAST(GROUPING(n_name) AS INT) AS g_nation
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP(r_name, n_name))
        SELECT r_name, n_name, revenue, n_items, g_region, g_nation,
          CAST(RANK() OVER (
            PARTITION BY g_region + g_nation,
                         CASE WHEN g_nation = 0 THEN r_name END
            ORDER BY revenue DESC, COALESCE(n_name, '')) AS INT) AS rk
        FROM rolled""")),

    // ------------------------------------------------------------------
    // EXISTS-correlated channel membership (TPC-DS q10/q35 shape,
    // round 14): customers who placed an URGENT 1996 order (EXISTS)
    // but NO URGENT 1998 order (NOT EXISTS), counted per segment and
    // nation. The DataFrame spells the decorrelation Catalyst would
    // derive anyway — each channel reduces to a DISTINCT custkey set,
    // then LEFT SEMI + LEFT ANTI hash joins on the already-distinct
    // key: one shuffle per channel on reduced data, no per-row
    // subquery re-execution, no fact-sized state. The oracle keeps the
    // correlated EXISTS/NOT EXISTS spelling.
    QueryEntry("d10_exists_channels",
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
        // the synthetic orders span 1995-2001 (NOT TPC-H's 1992-1998 —
        // the r11 ScaleUp gotcha); 1996/1998 keep both channels and the
        // result non-empty at every sf (probed: 24/267/2956 customers
        // at sf0.001/0.01/0.1)
        val urgent96 = o
          .filter(col("o_orderdate").between("1996-01-01", "1996-12-31") &&
            col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("k1")).distinct()
        val urgent98 = o
          .filter(col("o_orderdate").between("1998-01-01", "1998-12-31") &&
            col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("k2")).distinct()
        Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name"),
            col("c_nationkey") === col("n_nationkey"))
          .join(urgent96, col("c_custkey") === col("k1"), "left_semi")
          .join(urgent98, col("c_custkey") === col("k2"), "left_anti")
          .groupBy(col("c_mktsegment"), col("n_name").as("nation"))
          .agg(count(lit(1)).as("n_cust"))
      },
      Some("""SELECT c_mktsegment, n_name AS nation, COUNT(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
              AND o_orderpriority = '1-URGENT')
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate BETWEEN DATE '1998-01-01' AND DATE '1998-12-31'
              AND o_orderpriority = '1-URGENT')
        GROUP BY 1, 2""")),

    // ------------------------------------------------------------------
    // Multi-CTE cross-channel GROUPING SETS report (TPC-DS q80 shape,
    // round 14): the d01 channels (revenue by the customer's vs the
    // supplier's nation) unioned, then GROUPING SETS ((nation,
    // channel), (channel), ()) — per-cell detail, per-channel totals,
    // grand total in ONE pass. Union-then-aggregate keeps partial
    // aggregation map-side per channel; the grouping-sets Expand (x3)
    // runs over the union, and AQE sizes the single shuffle. GROUPING()
    // labels disambiguate total rows from NULL keys.
    QueryEntry("d11_grouping_sets_report",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val custCh = li
          .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, d, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name"),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), lit("customer").as("channel"), col("rev"))
        val suppCh = li
          .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, d, "nation").select("n_nationkey", "n_name"),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), lit("supplier").as("channel"), col("rev"))
        // pre-aggregate to the (nation, channel) GRAIN before the
        // grouping-sets Expand — the d02 economy: the x3 Expand copies
        // ~50 grain rows instead of 2x the fact stream (measured 14.5 s
        // -> grain-sized at sf1). Sum-of-sums in decimal is value-
        // identical; same empty-input caveat as d02 (never empty here).
        custCh.unionByName(suppCh)
          .groupBy(col("nation"), col("channel"))
          .agg(sum(col("rev").cast(graft.Parity.D)).as("rev1"),
            count(lit(1)).as("cnt1"))
          .groupingSets(
            Seq(Seq(col("nation"), col("channel")), Seq(col("channel")), Seq.empty),
            col("nation"), col("channel"))
          .agg(sum(col("rev1")).cast("double").as("revenue"),
            sum(col("cnt1")).as("n_items"),
            grouping(col("nation")).cast("int").as("g_nation"),
            grouping(col("channel")).cast("int").as("g_channel"))
      },
      Some(s"""WITH cust AS (
          SELECT n_name AS nation, 'customer' AS channel,
            l_extendedprice * (1 - l_discount) AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        supp AS (
          SELECT n_name AS nation, 'supplier' AS channel,
            l_extendedprice * (1 - l_discount) AS rev
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey),
        u AS (SELECT * FROM cust UNION ALL SELECT * FROM supp)
        SELECT nation, channel, ${oSum("rev")} AS revenue, COUNT(*) AS n_items,
          CAST(GROUPING(nation) AS INT) AS g_nation,
          CAST(GROUPING(channel) AS INT) AS g_channel
        FROM u
        GROUP BY GROUPING SETS ((nation, channel), (channel), ())""")),

    // ------------------------------------------------------------------
    // HAVING-filtered aggregate joined back to the dimension (TPC-DS
    // q34 "frequent bulky buyers" shape, round 14): orders with 5-7
    // line items (per-order COUNT + HAVING), re-aggregated to
    // customers holding >= 2 such orders, joined back to the customer
    // dimension. Two cheap count-only shuffles on shrinking keys
    // (order -> customer), then a hash join against the dim — the agg
    // -> HAVING -> join-back topology d01-d11 don't cover. Counts
    // only: no float parity concerns at all.
    QueryEntry("d12_bulky_frequent_buyers",
      (s, d) => {
        val bulky = Tables(s, d, "lineitem").select(col("l_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_lines"))
          .filter(col("n_lines").between(5, 7))
        val perCust = bulky
          .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_bulky"))
          .filter(col("n_bulky") >= 2)
        perCust
          .join(Tables(s, d, "customer").select("c_custkey", "c_name"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("n_bulky"))
      },
      Some("""WITH bulky AS (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 5 AND 7),
        per_cust AS (
          SELECT o_custkey, COUNT(*) AS n_bulky
          FROM bulky JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey HAVING COUNT(*) >= 2)
        SELECT c_custkey, c_name, n_bulky
        FROM per_cust JOIN customer ON o_custkey = c_custkey"""))
  )
}
