package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{QueryEntry, Tables}

/** Core relational operator coverage (SURVEY.md §2.3): projection,
  * filter, every join shape, hash aggregation, grouping sets, windows,
  * sorts/limits, set ops, subqueries, CTE semantics, VALUES, UNNEST.
  *
  * Each entry is written DataFrame-first (Catalyst plans the physical
  * strategy) and paired with an ANSI-SQL DuckDB oracle.
  *
  * Float-parity discipline (SURVEY.md §7.5): every SUM over doubles is
  * routed through DECIMAL(38,6) — exact and reduction-order-independent
  * — then cast back to double, so Spark's shuffle order can never change
  * a result the oracle computes sequentially. Averages are the exact
  * decimal sum divided by COUNT in double (bit-identical both engines).
  * Raw column values pass through untouched (already bit-identical).
  */
object CoreQueries {

  private val D = graft.Parity.D
  private def dsum(c: Column): Column = graft.Parity.dsum(c)
  private def oSum(e: String): String = graft.Parity.oSum(e)

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  val entries: Seq[QueryEntry] = Seq(

    // ------------------------------------------------------------------
    QueryEntry("q01_pricing_summary",
      (s, d) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            (sum(col("l_quantity").cast(D)).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(col("l_extendedprice").cast(D)).cast("double") / count(lit(1))).as("avg_price"),
            (sum(col("l_discount").cast(D)).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${oSum("l_quantity")} AS sum_qty,
        ${oSum("l_extendedprice")} AS sum_base_price,
        ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${oSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${oSum("l_quantity")} / COUNT(*) AS avg_qty,
        ${oSum("l_extendedprice")} / COUNT(*) AS avg_price,
        ${oSum("l_discount")} / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------
    QueryEntry("q02_filter_project",
      (s, d) => {
        t(s, d, "part")
          .filter(col("p_type").isin("ECONOMY", "SMALL") &&
            col("p_size").between(10, 30) && col("p_name").like("%bolt%"))
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      },
      Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        FROM part WHERE p_type IN ('ECONOMY','SMALL')
        AND p_size BETWEEN 10 AND 30 AND p_name LIKE '%bolt%'""")),

    // ------------------------------------------------------------------
    QueryEntry("q03_shipping_priority",
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
        // dimension side is small: broadcast it so the big fact scan
        // never shuffles on the probe side.
        broadcast(cust).join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            col("o_orderdate").cast(DateType).cast(StringType).as("orderdate"),
            col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey,
        ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
        CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ------------------------------------------------------------------
    QueryEntry("q04_semi_join",
      (s, d) => {
        val ord = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        ord.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > date_add(col("o_orderdate"), 30),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)
        GROUP BY o_orderpriority""")),

    // ------------------------------------------------------------------
    QueryEntry("q05_anti_join",
      (s, d) => {
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("acctbal_sum"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
        ${oSum("c_acctbal")} AS acctbal_sum
        FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment""")),

    // ------------------------------------------------------------------
    QueryEntry("q06_outer_join_custdist",
      (s, d) => {
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
        GROUP BY c_count""")),

    // ------------------------------------------------------------------
    QueryEntry("q07_full_outer_join",
      (s, d) => {
        val cn = t(s, d, "customer").groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_customers"))
        val sn = t(s, d, "supplier").groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_suppliers"))
        cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_customers"), lit(0L)).as("n_customers"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      },
      Some("""SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
          COALESCE(n_customers, 0) AS n_customers,
          COALESCE(n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
        FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
          ON c_nationkey = s_nationkey""")),

    // ------------------------------------------------------------------
    QueryEntry("q08_theta_join",
      (s, d) => {
        val r = t(s, d, "region")
        val r1 = r.select(col("r_regionkey").as("k1"), col("r_name").as("name1"))
        val r2 = r.select(col("r_regionkey").as("k2"), col("r_name").as("name2"))
        r1.crossJoin(r2).filter(col("k1") < col("k2")).select("name1", "name2")
      },
      Some("""SELECT r1.r_name AS name1, r2.r_name AS name2
        FROM region r1, region r2 WHERE r1.r_regionkey < r2.r_regionkey""")),

    // ------------------------------------------------------------------
    QueryEntry("q09_distinct",
      (s, d) => t(s, d, "customer").select("c_mktsegment", "c_nationkey").distinct(),
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer")),

    // ------------------------------------------------------------------
    QueryEntry("q10_set_ops",
      (s, d) => {
        val a = t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k"))
        val b = t(s, d, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("k"))
        a.union(b).distinct().withColumn("op", lit("union"))
          .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
          .unionByName(a.except(b).withColumn("op", lit("except")))
          .unionByName(a.intersectAll(b).withColumn("op", lit("intersect_all")))
          .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
          .select("op", "k")
      },
      Some("""WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
             b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
        SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
        UNION ALL SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        UNION ALL SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        UNION ALL SELECT 'intersect_all' AS op, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        UNION ALL SELECT 'except_all' AS op, k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)""")),

    // ------------------------------------------------------------------
    QueryEntry("q11_rollup",
      (s, d) => {
        t(s, d, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
            grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_prio"))
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        ${oSum("o_totalprice")} AS total,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")),

    // ------------------------------------------------------------------
    QueryEntry("q12_window_rank",
      (s, d) => {
        val byPrice = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        val bySize = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
        t(s, d, "part")
          .withColumn("rn", row_number().over(byPrice))
          .withColumn("rnk", rank().over(bySize))
          .withColumn("drnk", dense_rank().over(bySize))
          .withColumn("ntile4", ntile(4).over(byPrice))
          .withColumn("pct_rank", percent_rank().over(bySize))
          .withColumn("cdist", cume_dist().over(bySize))
          .filter(col("rn") <= 3)
          .select("p_brand", "p_partkey", "p_retailprice", "rn", "rnk",
            "drnk", "ntile4", "pct_rank", "cdist")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, rn, rnk, drnk, ntile4, pct_rank, cdist
        FROM (SELECT p_brand, p_partkey, p_retailprice,
          ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn,
          RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
          DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk,
          NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS ntile4,
          PERCENT_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS pct_rank,
          CUME_DIST() OVER (PARTITION BY p_brand ORDER BY p_size) AS cdist
          FROM part) t WHERE rn <= 3""")),

    // ------------------------------------------------------------------
    QueryEntry("q13_window_analytic",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val runFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fullFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(runFrame).as("first_price"),
          last(col("o_totalprice")).over(fullFrame).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(runFrame).as("second_price"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        LEAD(o_totalprice, 1) OVER w AS next_price,
        FIRST_VALUE(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
        LAST_VALUE(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        NTH_VALUE(o_totalprice, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // ------------------------------------------------------------------
    QueryEntry("q14_window_frames",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          sum(col("o_totalprice").cast(D)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("run_total"),
          (sum(col("o_totalprice").cast(D)).over(w.rowsBetween(-2, 0)).cast("double") /
            count(lit(1)).over(w.rowsBetween(-2, 0))).as("mov_avg3"),
          sum(col("o_totalprice").cast(D)).over(w.rangeBetween(-5, 0))
            .cast("double").as("range_total"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
          / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg3,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (w RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_total
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""")),

    // ------------------------------------------------------------------
    QueryEntry("q15_topk",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")),

    // ------------------------------------------------------------------
    QueryEntry("q16_stat_aggs",
      (s, d) => {
        t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(stddev_pop(col("l_discount")), 6).as("sdp_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qe"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qe"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      },
      Some("""SELECT l_returnflag,
        ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
        ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        ROUND(STDDEV_POP(l_discount), 6) AS sdp_disc,
        ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qe,
        ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_qe,
        ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
        ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS icept,
        ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
        REGR_COUNT(l_extendedprice, l_quantity) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // ------------------------------------------------------------------
    QueryEntry("q17_distinct_aggs",
      (s, d) => {
        t(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey"), col("l_partkey")).as("nd_supp_part"),
          sum_distinct(col("l_quantity")).as("sd_qty"),
          count(lit(1)).as("n"))
      },
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS nd_part,
        COUNT(DISTINCT (l_suppkey, l_partkey)) AS nd_supp_part,
        SUM(DISTINCT l_quantity) AS sd_qty, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // ------------------------------------------------------------------
    QueryEntry("q18_min_max_by",
      (s, d) => {
        t(s, d, "customer").groupBy(col("c_nationkey")).agg(
          min_by(col("c_name"), col("c_custkey")).as("first_cust"),
          max_by(col("c_name"), col("c_custkey")).as("last_cust"),
          max(col("c_acctbal")).as("max_bal"),
          min(col("c_acctbal")).as("min_bal"))
      },
      Some("""SELECT c_nationkey,
        MIN_BY(c_name, c_custkey) AS first_cust,
        MAX_BY(c_name, c_custkey) AS last_cust,
        MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal
        FROM customer GROUP BY c_nationkey""")),

    // ------------------------------------------------------------------
    QueryEntry("q19_ordered_listagg",
      (s, d) => {
        t(s, d, "nation")
          .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
            count(lit(1)).as("n_nations"))
      },
      Some("""SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
        COUNT(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""")),

    // ------------------------------------------------------------------
    QueryEntry("q20_scalar_subquery",
      (s, d) => {
        val part = t(s, d, "part")
        val brandAvg = part.groupBy(col("p_brand"))
          .agg((sum(col("p_retailprice").cast(D)).cast("double") / count(lit(1))).as("brand_avg"))
        part.join(broadcast(brandAvg), "p_brand")
          .filter(col("p_retailprice") > col("brand_avg") * 1.2)
          .select("p_partkey", "p_brand", "p_retailprice", "brand_avg")
      },
      Some(s"""SELECT p_partkey, p_brand, p_retailprice, brand_avg
        FROM (SELECT p.p_partkey, p.p_brand, p.p_retailprice,
          (SELECT ${oSum("p2.p_retailprice")} / COUNT(*) FROM part p2
           WHERE p2.p_brand = p.p_brand) AS brand_avg FROM part p) t
        WHERE p_retailprice > brand_avg * 1.2""")),

    // ------------------------------------------------------------------
    QueryEntry("q21_in_subquery",
      (s, d) => {
        val asiaNations = t(s, d, "nation")
          .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))
        t(s, d, "supplier")
          .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select("s_suppkey", "s_name", "s_acctbal")
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
          JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')""")),

    // ------------------------------------------------------------------
    QueryEntry("q22_cte_top_supplier",
      (s, d) => {
        val rev = t(s, d, "lineitem").groupBy(col("l_suppkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_rev"))
        val mx = rev.agg(max(col("total_rev")).as("mx"))
        t(s, d, "supplier")
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .crossJoin(broadcast(mx))
          .filter(col("total_rev") === col("mx"))
          .select("s_suppkey", "s_name", "total_rev")
      },
      Some(s"""WITH revenue AS (
          SELECT l_suppkey, ${oSum("l_extendedprice * (1.0 - l_discount)")} AS total_rev
          FROM lineitem GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""")),

    // ------------------------------------------------------------------
    QueryEntry("q23_values_join",
      (s, d) => {
        import s.implicits._
        val zones = Seq(
          (0, "Africa zone"), (1, "Americas zone"), (2, "Asia zone"),
          (3, "Europe zone"), (4, "Mideast zone")).toDF("rk", "zone")
        t(s, d, "region").join(zones, col("r_regionkey") === col("rk"))
          .select("r_name", "zone")
      },
      Some("""SELECT r_name, zone FROM region
        JOIN (VALUES (0,'Africa zone'),(1,'Americas zone'),(2,'Asia zone'),
          (3,'Europe zone'),(4,'Mideast zone')) AS v(rk, zone)
        ON r_regionkey = rk""")),

    // ------------------------------------------------------------------
    // Bernoulli sampling via a deterministic content hash: each row is
    // kept iff md5(key) falls below the ~10% threshold (0.1 in hex is
    // 0x1999...), so the SAME sample materializes in any engine — the
    // property that makes samples reproducible across reruns and
    // engines at scale (engine-seeded TABLESAMPLE is not; the native
    // .sample()/TABLESAMPLE surface is exercised in SqlSpec).
    QueryEntry("q24_sample",
      (s, d) => t(s, d, "lineitem")
        .filter(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber")))
          < "19999999999999999999999999999999")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        WHERE MD5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))
          < '19999999999999999999999999999999'
        GROUP BY l_returnflag""")),

    // ------------------------------------------------------------------
    QueryEntry("q25_unnest_words",
      (s, d) => {
        t(s, d, "part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT word, COUNT(*) AS n FROM (
          SELECT UNNEST(STRING_SPLIT(p_name, ' ')) AS word FROM part) t
        GROUP BY word""")),

    // ------------------------------------------------------------------
    // Recursive CTE (Spark 4 WITH RECURSIVE; Trino 468 lacks general
    // recursive execution — SURVEY §2.3 notes ours is a superset):
    // month spine LEFT JOINed to order counts, so empty months appear.
    QueryEntry("q26_recursive_cte",
      (s, d) => {
        graft.Tables(s, d, "orders").createOrReplaceTempView("orders_rc")
        s.sql("""
          WITH RECURSIVE months(m) AS (
            SELECT DATE '1996-01-01'
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM months WHERE m < DATE '1996-12-01')
          SELECT CAST(m AS STRING) AS month_start, COUNT(o_orderkey) AS n_orders
          FROM months LEFT JOIN orders_rc
            ON CAST(date_trunc('MONTH', o_orderdate) AS DATE) = m
          GROUP BY m""")
      },
      Some("""WITH RECURSIVE months(m) AS (
          SELECT DATE '1996-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1996-12-01')
        SELECT CAST(m AS VARCHAR) AS month_start, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON CAST(DATE_TRUNC('MONTH', o_orderdate) AS DATE) = m
        GROUP BY m""")),

    // ------------------------------------------------------------------
    // GROUPS window frames (Trino has them, Spark does not — SURVEY
    // §2.3 flagged the delta). Emulated exactly: a GROUPS frame over
    // ORDER BY k is a RANGE frame over dense_rank(k), since dense_rank
    // numbers peer groups consecutively. DuckDB lacks GROUPS too, so
    // the oracle runs the identical rewrite — a cross-engine check of
    // the emulation itself.
    QueryEntry("q27_groups_frame",
      (s, d) => {
        // Scale shape (r1 verdict fix): the naive spelling puts EVERY
        // row through two unpartitioned windows — one task at 100 TB.
        // But a GROUPS frame over ORDER BY day only ever needs per-day
        // aggregates: the data-sized work is one distributed groupBy
        // (day), and dense_rank + the +-1-group frame are computed on
        // the calendar-bounded day table (tiny by construction) with
        // windowless self-joins, then broadcast back to the rows. No
        // WindowExec anywhere in the plan (PlanSpec asserts).
        val urgent = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1996-04-01").cast(TimestampType))
          .select(col("o_orderkey"),
            col("o_orderdate").cast(DateType).as("day"), col("o_totalprice"))
        // data-sized: one shuffle on day; DECIMAL sums are exact, so
        // regrouping below cannot drift from the oracle's window SUM
        val dayAgg = urgent.groupBy(col("day"))
          .agg(sum(col("o_totalprice").cast(D)).as("day_rev"),
            count(lit(1)).as("day_n"))
        // dense_rank(day) == count of distinct days <= day
        val grp = dayAgg
          .join(dayAgg.select(col("day").as("d2")), col("d2") <= col("day"))
          .groupBy(col("day"), col("day_rev"), col("day_n"))
          .agg(count(lit(1)).as("grp"))
        // GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING == sum over the
        // day-groups whose rank is within +-1
        val moving = grp
          .join(grp.select(col("grp").as("g2"), col("day_rev").as("rev2"),
              col("day_n").as("n2")),
            col("g2").between(col("grp") - 1, col("grp") + 1))
          .groupBy(col("day"))
          .agg(sum(col("rev2")).cast("double").as("moving_rev"),
            sum(col("n2")).as("peer_orders"))
        urgent.join(broadcast(moving), "day")
          .select(col("o_orderkey"), col("day").cast(StringType).as("day"),
            col("moving_rev"), col("peer_orders"))
      },
      Some("""WITH urgent AS (
          SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day, o_totalprice
          FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'),
        g AS (SELECT *, DENSE_RANK() OVER (ORDER BY day) AS grp FROM urgent)
        SELECT o_orderkey, CAST(day AS VARCHAR) AS day,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            OVER (ORDER BY grp RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
            AS DOUBLE) AS moving_rev,
          COUNT(*) OVER (ORDER BY grp RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
            AS peer_orders
        FROM g""")),

    // ------------------------------------------------------------------
    // MATCH_RECOGNIZE-style pattern detection (Trino's MATCH_RECOGNIZE;
    // SURVEY §2.3 stretch): per-user maximal runs of strictly rising
    // `value` in the event stream (pattern A UP{2,}), reported with
    // run start/end/length. Gaps-and-islands: lag -> rising flag ->
    // run id via a running count of breaks -> aggregate per island.
    QueryEntry("q28_pattern_runs",
      (s, d) => {
        // events.ts is ns parquet (Spark truncates to µs, a ns-capable
        // oracle would not) -> never emit raw timestamps: format run
        // bounds to second granularity, and tie-break ordering on
        // event_id so µs-collisions cannot reorder rows cross-engine
        // (EventQueries header discipline).
        val ev = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev.withColumn("rising",
            when(col("value") > lag(col("value"), 1).over(byTs), 0).otherwise(1))
          .withColumn("run_id",
            sum(col("rising")).over(byTs.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("run_id"))
          .agg(count(lit(1)).as("run_len"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("run_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("run_end"))
          .filter(col("run_len") >= 3)
          .select("user_id", "run_start", "run_end", "run_len")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        f AS (SELECT user_id, ts, event_id, value,
            CASE WHEN value > LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              THEN 0 ELSE 1 END AS rising
          FROM ev),
        r AS (SELECT user_id, ts,
            SUM(rising) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
          FROM f)
        SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS run_start,
          STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS run_end, COUNT(*) AS run_len
        FROM r GROUP BY user_id, run_id HAVING COUNT(*) >= 3""")),

    // ------------------------------------------------------------------
    // MATCH_RECOGNIZE (SQL:2016 row pattern recognition, the full-regex
    // half q28's gaps-and-islands does not cover): per-user V-shaped
    // purchase-value patterns, PATTERN (D+ U+) with DEFINE D AS delta<0,
    // U AS delta>0, ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW.
    // PREV(value) navigation is precomputed as a lag window column
    // (Spark-first spelling), then graft's backtracking row-pattern
    // matcher (operators/PatternMatch.scala) runs over the sorted
    // per-user stream. The oracle spells the same semantics as
    // gaps-and-islands SQL: greedy D+ consumes a maximal falling run,
    // U+ the adjacent maximal rising run, so matches are exactly
    // (maximal D-run, adjacent U-run) pairs — provably identical to
    // the NFA's leftmost-greedy, skip-past-last-row behavior.
    QueryEntry("q29_match_recognize",
      // Round 8: the entry types the TRINO CLAUSE ITSELF — SQL text
      // through the injected-parser surface (sql/MatchRecognizeSql),
      // which lowers onto the same PatternMatch operator the round-6/7
      // entries called directly: PREV() becomes the lag window column
      // (whose exchange the matcher then reuses, prePartitioned — one
      // shuffle, the exact plan the operator spelling produced), and
      // the oracle is byte-unchanged, so the correctness gate now
      // checks the SQL-Lab path end-to-end. q28 timestamp discipline:
      // ts formatted to seconds inside the source subquery.
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT * FROM (
            SELECT user_id, ts, event_id, value,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(D.ts_s) AS start_ts, LAST(U.ts_s) AS end_ts,
              COUNT(D.*) AS n_down, COUNT(U.*) AS n_up,
              LAST(D.value) AS bottom, LAST(U.value) AS peak
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D+ U+)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > PREV(U.value)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
          FROM ev),
        c AS (SELECT *, CASE WHEN delta < 0 THEN 'D' WHEN delta > 0 THEN 'U' ELSE 'X' END AS cls,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM d),
        r AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp FROM c),
        runs AS (SELECT user_id, cls, grp, MIN(rn) AS srn, MAX(rn) AS ern,
            STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
            STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
            COUNT(*) AS n, ARG_MAX(value, rn) AS last_v
          FROM r GROUP BY user_id, cls, grp),
        paired AS (SELECT a.user_id, a.srn,
            a.start_s AS start_ts, b.end_s AS end_ts,
            a.n AS n_down, b.n AS n_up, a.last_v AS bottom, b.last_v AS peak
          FROM runs a JOIN runs b
            ON b.user_id = a.user_id AND b.srn = a.ern + 1
           AND a.cls = 'D' AND b.cls = 'U')
        SELECT user_id,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY srn) AS match_num,
          start_ts, end_ts, n_down, n_up, bottom, peak
        FROM paired""")),

    // ------------------------------------------------------------------
    // ALL ROWS PER MATCH twin of q29: same down-run/up-run pattern,
    // but emitting every matched row with the classifier the winning
    // path assigned — the mode BI drill-downs use to paint the rows of
    // each match. Oracle expands the q29 run-pairing to row grain.
    QueryEntry("q31_pattern_allrows",
      // SQL-text spelling since round 8, like q29 (same lowering, same
      // one-shuffle plan, oracle unchanged)
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT user_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s,
                 event_id, match_num, classifier
          FROM (
            SELECT user_id, ts, event_id, value
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D+ U+)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > PREV(U.value)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
          FROM ev),
        c AS (SELECT *, CASE WHEN delta < 0 THEN 'D' WHEN delta > 0 THEN 'U' ELSE 'X' END AS cls,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM d),
        r AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp FROM c),
        runs AS (SELECT user_id, cls, grp, MIN(rn) AS srn, MAX(rn) AS ern
          FROM r GROUP BY user_id, cls, grp),
        paired AS (SELECT a.user_id, a.srn, b.ern,
            ROW_NUMBER() OVER (PARTITION BY a.user_id ORDER BY a.srn) AS match_num
          FROM runs a JOIN runs b
            ON b.user_id = a.user_id AND b.srn = a.ern + 1
           AND a.cls = 'D' AND b.cls = 'U')
        SELECT p.user_id, STRFTIME(x.ts, '%Y-%m-%d %H:%M:%S') AS ts_s, x.event_id,
          p.match_num, x.cls AS classifier
        FROM paired p
        JOIN r x ON x.user_id = p.user_id AND x.rn BETWEEN p.srn AND p.ern""")),

    // ------------------------------------------------------------------
    // Row-pattern funnel (bounded quantifier + backtracking): per-user
    // PATTERN (V C{1,2} P) over the event stream — view, one or two
    // clicks (greedy prefers two), purchase. A match span contains no
    // second V, so matches from distinct views can never overlap —
    // which lets the oracle spell the same semantics with LEADs: a
    // view matches iff the next rows are (C,C,P) [greedy] or (C,P).
    QueryEntry("q30_pattern_funnel",
      // SQL-text spelling since round 8, like q29 (bounded quantifier
      // through the clause grammar; no PREV here, so the matcher does
      // its own single exchange — the operator spelling's plan)
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT * FROM (
            SELECT user_id, ts, event_id, event_type, value FROM mr_events
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(V.event_id) AS start_event,
              COUNT(C.*) AS n_clicks, LAST(P.value) AS purchase_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (V C{1,2} P)
            DEFINE V AS V.event_type = 'view',
                   C AS C.event_type = 'click',
                   P AS P.event_type = 'purchase'
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, event_type, value FROM events),
        w AS (SELECT user_id, event_id, event_type,
            ROW_NUMBER() OVER win AS rn,
            LEAD(event_type, 1) OVER win AS t1,
            LEAD(event_type, 2) OVER win AS t2,
            LEAD(event_type, 3) OVER win AS t3,
            LEAD(value, 2) OVER win AS v2,
            LEAD(value, 3) OVER win AS v3
          FROM ev WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        m AS (SELECT user_id, rn, event_id AS start_event,
            CASE WHEN t2 = 'click' AND t3 = 'purchase' THEN 2 ELSE 1 END AS n_clicks,
            CASE WHEN t2 = 'click' AND t3 = 'purchase' THEN v3 ELSE v2 END AS purchase_value
          FROM w
          WHERE event_type = 'view' AND t1 = 'click'
            AND ((t2 = 'click' AND t3 = 'purchase') OR t2 = 'purchase'))
        SELECT user_id,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS match_num,
          start_event, CAST(n_clicks AS BIGINT) AS n_clicks, purchase_value
        FROM m""")),

    // ------------------------------------------------------------------
    // The two Trino MATCH_RECOGNIZE forms a real funnel query hits
    // first beyond q29-q31's core (r8 verdict #1): ORDER BY ... DESC
    // (the matcher walks each user's purchases NEWEST-first) and AFTER
    // MATCH SKIP TO NEXT ROW (overlapping matches — every qualifying
    // start position yields its own match). Same D+ U+ value pattern
    // as q29, but on the reversed stream: PREV() here is the NEXT
    // purchase in time. Under skip-to-next the match set is exactly
    // "every suffix of a maximal D run, each paired with the adjacent
    // U run" — the oracle spells that as q29's run-pairing EXPANDED by
    // one row per D-run position (DuckDB has no MATCH_RECOGNIZE, so
    // the equivalence is the spec: greedy D+ from start p consumes to
    // the run's end, U+ the whole adjacent run, restart at p+1).
    QueryEntry("q32_pattern_skipnext_desc",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT * FROM (
            SELECT user_id, ts, event_id, value,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC
            MEASURES FIRST(D.ts_s) AS start_ts, LAST(U.ts_s) AS end_ts,
              COUNT(D.*) AS n_down, COUNT(U.*) AS n_up,
              LAST(D.value) AS bottom, LAST(U.value) AS peak
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (D+ U+)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > PREV(U.value)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS delta
          FROM ev),
        c AS (SELECT *, CASE WHEN delta < 0 THEN 'D' WHEN delta > 0 THEN 'U' ELSE 'X' END AS cls,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM d),
        r AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp FROM c),
        runs AS (SELECT user_id, cls, grp, MIN(rn) AS srn, MAX(rn) AS ern,
            COUNT(*) AS n, ARG_MAX(value, rn) AS last_v,
            STRFTIME(ARG_MAX(ts, rn), '%Y-%m-%d %H:%M:%S') AS last_ts
          FROM r GROUP BY user_id, cls, grp),
        paired AS (SELECT a.user_id, a.srn, a.ern,
            b.n AS n_up, a.last_v AS bottom, b.last_v AS peak, b.last_ts AS end_ts
          FROM runs a JOIN runs b
            ON b.user_id = a.user_id AND b.srn = a.ern + 1
           AND a.cls = 'D' AND b.cls = 'U'),
        m AS (SELECT p.user_id, x.rn,
            STRFTIME(x.ts, '%Y-%m-%d %H:%M:%S') AS start_ts, p.end_ts,
            CAST(p.ern - x.rn + 1 AS BIGINT) AS n_down, p.n_up, p.bottom, p.peak
          FROM paired p JOIN r x
            ON x.user_id = p.user_id AND x.rn BETWEEN p.srn AND p.ern)
        SELECT user_id,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS match_num,
          start_ts, end_ts, n_down, n_up, bottom, peak
        FROM m""")),

    // ------------------------------------------------------------------
    // The rest of the MEASURES dialect (round 9): ALL ROWS PER MATCH
    // with RUNNING (per-row prefix aggregates — the SQL default in this
    // mode) and FINAL (whole-match constants) measures, plus a SUBSET
    // union variable S = (D, U) aggregated across both symbols. The
    // RUNNING LAST(S.ts_s) measure is the idiomatic way to carry a
    // non-key source column through ALL ROWS output (it equals the
    // current row's value because S covers every classifier). Oracle:
    // q31's run-pairing expanded to row grain, with the running
    // measures as ordinary window functions over each match's rows.
    QueryEntry("q33_pattern_running_measures",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT user_id, event_id, match_num, classifier, ts_s,
                 n_so_far, min_so_far, n_down, peak
          FROM (
            SELECT user_id, ts, event_id, value,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES RUNNING LAST(S.ts_s) AS ts_s, COUNT(S.*) AS n_so_far,
              RUNNING MIN(S.value) AS min_so_far,
              FINAL COUNT(D.*) AS n_down, FINAL LAST(U.value) AS peak
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D+ U+)
            SUBSET S = (D, U)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > PREV(U.value)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
          FROM ev),
        c AS (SELECT *, CASE WHEN delta < 0 THEN 'D' WHEN delta > 0 THEN 'U' ELSE 'X' END AS cls,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM d),
        r AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp FROM c),
        runs AS (SELECT user_id, cls, grp, MIN(rn) AS srn, MAX(rn) AS ern,
            COUNT(*) AS n, ARG_MAX(value, rn) AS last_v
          FROM r GROUP BY user_id, cls, grp),
        paired AS (SELECT a.user_id, a.srn, b.ern,
            CAST(a.n AS BIGINT) AS n_down, b.last_v AS peak,
            ROW_NUMBER() OVER (PARTITION BY a.user_id ORDER BY a.srn) AS match_num
          FROM runs a JOIN runs b
            ON b.user_id = a.user_id AND b.srn = a.ern + 1
           AND a.cls = 'D' AND b.cls = 'U')
        SELECT p.user_id, x.event_id, p.match_num, x.cls AS classifier,
          STRFTIME(x.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
          ROW_NUMBER() OVER w AS n_so_far,
          MIN(x.value) OVER w AS min_so_far,
          p.n_down, p.peak
        FROM paired p JOIN r x
          ON x.user_id = p.user_id AND x.rn BETWEEN p.srn AND p.ern
        WINDOW w AS (PARTITION BY p.user_id, p.match_num ORDER BY x.rn)""")),

    // ------------------------------------------------------------------
    // Classifier-history navigation in DEFINE (round 10, r9 verdict #1):
    // FIRST(D.value) inside U's condition reads the match-so-far's
    // classification, so the NFA evaluates it DURING matching (the one
    // DEFINE form that cannot precompute as a window column). The
    // funnel: a strict decline D+ that RECOVERS ABOVE ITS OWN START —
    // U.value > FIRST(D.value). Oracle closed form (DuckDB has no
    // MATCH_RECOGNIZE; proven against the matcher on 300 random streams
    // in PatternMatchSpec): within a maximal declining run [s..e] the
    // values strictly decrease, so rows after the attempt's first D can
    // never satisfy U — greedy D+ always reaches the run's end, and the
    // leftmost viable start is the FIRST p in [s..e] whose value the
    // successor row e+1 exceeds (monotone in p); the match consumes
    // [p, e+1] and SKIP PAST LAST ROW jumps the run, so each run yields
    // at most one match.
    QueryEntry("q34_pattern_hist_nav",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT * FROM (
            SELECT user_id, ts, event_id, value,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(D.ts_s) AS start_ts, FIRST(D.value) AS dip_start,
              COUNT(D.*) AS n_down, LAST(D.value) AS bottom,
              LAST(U.value) AS rebound
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D+ U)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > FIRST(D.value)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER w AS delta,
            ROW_NUMBER() OVER w AS rn
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        dr AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM d WHERE delta < 0),
        runs AS (SELECT user_id, grp, MIN(rn) AS srn, MAX(rn) AS ern,
            ARG_MAX(value, rn) AS bottom
          FROM dr GROUP BY user_id, grp),
        succ AS (SELECT runs.*, x.value AS uval
          FROM runs JOIN d x ON x.user_id = runs.user_id AND x.rn = runs.ern + 1),
        m AS (SELECT s.user_id, s.ern, s.bottom, s.uval, MIN(p.rn) AS prn
          FROM succ s JOIN d p ON p.user_id = s.user_id
            AND p.rn BETWEEN s.srn AND s.ern AND s.uval > p.value
          GROUP BY s.user_id, s.ern, s.bottom, s.uval),
        out0 AS (SELECT m.user_id,
            STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
            p.value AS dip_start,
            CAST(m.ern - m.prn + 1 AS BIGINT) AS n_down,
            m.bottom, m.uval AS rebound, m.prn
          FROM m JOIN d p ON p.user_id = m.user_id AND p.rn = m.prn)
        SELECT user_id,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY prn) AS match_num,
          start_ts, dip_start, n_down, bottom, rebound
        FROM out0""")),

    // ------------------------------------------------------------------
    // ALL ROWS PER MATCH WITH UNMATCHED ROWS (round 10): the totality
    // sub-mode — every input row comes back out; rows inside a match
    // carry match_num / classifier / FINAL measures, rows outside carry
    // NULLs for all of them. Same V-pattern as q33; the oracle is q33's
    // matched-row expansion UNION ALL the span-complement with NULLs.
    QueryEntry("q35_pattern_unmatched_rows",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT user_id, event_id, match_num, classifier, n_down, peak
          FROM (
            SELECT user_id, ts, event_id, value
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FINAL COUNT(D.*) AS n_down, FINAL LAST(U.value) AS peak
            ALL ROWS PER MATCH WITH UNMATCHED ROWS
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D+ U+)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > PREV(U.value)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
          FROM ev),
        c AS (SELECT *, CASE WHEN delta < 0 THEN 'D' WHEN delta > 0 THEN 'U' ELSE 'X' END AS cls,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM d),
        r AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp FROM c),
        runs AS (SELECT user_id, cls, grp, MIN(rn) AS srn, MAX(rn) AS ern,
            COUNT(*) AS n, ARG_MAX(value, rn) AS last_v
          FROM r GROUP BY user_id, cls, grp),
        paired AS (SELECT a.user_id, a.srn, b.ern,
            CAST(a.n AS BIGINT) AS n_down, b.last_v AS peak,
            ROW_NUMBER() OVER (PARTITION BY a.user_id ORDER BY a.srn) AS match_num
          FROM runs a JOIN runs b
            ON b.user_id = a.user_id AND b.srn = a.ern + 1
           AND a.cls = 'D' AND b.cls = 'U'),
        matched AS (SELECT p.user_id, x.event_id, p.match_num,
            x.cls AS classifier, p.n_down, p.peak
          FROM paired p JOIN r x
            ON x.user_id = p.user_id AND x.rn BETWEEN p.srn AND p.ern),
        unmatched AS (SELECT c.user_id, c.event_id,
            CAST(NULL AS BIGINT) AS match_num, CAST(NULL AS VARCHAR) AS classifier,
            CAST(NULL AS BIGINT) AS n_down, CAST(NULL AS DOUBLE) AS peak
          FROM c WHERE NOT EXISTS (SELECT 1 FROM paired p
            WHERE p.user_id = c.user_id AND c.rn BETWEEN p.srn AND p.ern))
        SELECT * FROM matched UNION ALL SELECT * FROM unmatched""")),

    // ------------------------------------------------------------------
    // MEASURES navigation + occurrence arguments (round 10): over the
    // q29 V-pattern, PREV(D.value) reads the PARTITION row before
    // LAST(D) — the second-to-last declining row, or the pre-fall peak
    // when the decline is one row — and FIRST(D.value, 1) reads the
    // SECOND declining row (null when there is only one). Both are
    // plain positional reads in the run-pairing oracle: the D run is a
    // contiguous rn interval, so PREV(LAST(D)) = value at ern-1 and
    // FIRST(D, 1) = value at srn+1 when srn+1 <= ern.
    QueryEntry("q36_pattern_measure_nav",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT * FROM (
            SELECT user_id, ts, event_id, value,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(D.ts_s) AS start_ts, COUNT(D.*) AS n_down,
              PREV(D.value) AS before_bottom, FIRST(D.value, 1) AS second_dip
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D+ U+)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > PREV(U.value)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER w AS delta,
            ROW_NUMBER() OVER w AS rn
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        c AS (SELECT *, CASE WHEN delta < 0 THEN 'D' WHEN delta > 0 THEN 'U' ELSE 'X' END AS cls
          FROM d),
        r AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp FROM c),
        runs AS (SELECT user_id, cls, grp, MIN(rn) AS srn, MAX(rn) AS ern,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM r GROUP BY user_id, cls, grp),
        paired AS (SELECT a.user_id, a.srn, a.ern, a.n AS n_down
          FROM runs a JOIN runs b
            ON b.user_id = a.user_id AND b.srn = a.ern + 1
           AND a.cls = 'D' AND b.cls = 'U')
        SELECT p.user_id,
          ROW_NUMBER() OVER (PARTITION BY p.user_id ORDER BY p.srn) AS match_num,
          STRFTIME(s.ts, '%Y-%m-%d %H:%M:%S') AS start_ts, p.n_down,
          pb.value AS before_bottom, sd.value AS second_dip
        FROM paired p
        JOIN d s ON s.user_id = p.user_id AND s.rn = p.srn
        JOIN d pb ON pb.user_id = p.user_id AND pb.rn = p.ern - 1
        LEFT JOIN d sd ON sd.user_id = p.user_id AND sd.rn = p.srn + 1
          AND sd.rn <= p.ern""")),

    // ------------------------------------------------------------------
    // Navigation over arbitrary EXPRESSIONS (round 10, the dialect's
    // last named rejection closed): each one-symbol expression inside
    // PREV/FIRST/SUM materializes as a synthetic source column and the
    // call lowers to the plain form (MatchRecognizeSql.xlateExprArgs).
    // The funnel: a controlled decline — each step down but never
    // below half the prior value (PREV(D.value * 0.5)) — that recovers
    // 2% above its own start (FIRST(D.value * 1.02)); the computed
    // MEASURES aggregate SUM(CAST(D.value < 50 AS INT)) counts dip
    // rows under 50, a conditional count the plain grammar cannot
    // spell. Oracle closed form extends q34's run-pairing proof: D
    // rows strictly decrease inside a maximal run and values are
    // positive, so no row inside the run can exceed value[p] * 1.02 —
    // greedy D+ always reaches the run end, U is the unique successor
    // row, and the leftmost viable start is MIN(p) with
    // uval > value[p] * 1.02 (threshold monotone in p).
    QueryEntry("q37_pattern_expr_nav",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT * FROM (
            SELECT user_id, ts, event_id, value,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(D.ts_s) AS start_ts, COUNT(D.*) AS n_down,
              LAST(D.value) AS bottom, LAST(U.value) AS rebound,
              SUM(CAST(D.value < 50 AS INT)) AS n_below50
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D+ U)
            DEFINE D AS D.value < PREV(D.value)
                    AND D.value > PREV(D.value * 0.5),
                   U AS U.value > FIRST(D.value * 1.02)
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            LAG(value) OVER w AS pv,
            ROW_NUMBER() OVER w AS rn
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        dr AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM d WHERE value < pv AND value > pv * 0.5),
        runs AS (SELECT user_id, grp, MIN(rn) AS srn, MAX(rn) AS ern,
            ARG_MAX(value, rn) AS bottom
          FROM dr GROUP BY user_id, grp),
        succ AS (SELECT runs.*, x.value AS uval
          FROM runs JOIN d x ON x.user_id = runs.user_id AND x.rn = runs.ern + 1),
        m AS (SELECT s.user_id, s.srn, s.ern, s.bottom, s.uval, MIN(p.rn) AS prn
          FROM succ s JOIN dr p ON p.user_id = s.user_id
            AND p.rn BETWEEN s.srn AND s.ern AND s.uval > p.value * 1.02
          GROUP BY s.user_id, s.srn, s.ern, s.bottom, s.uval),
        meas AS (SELECT m.user_id, m.prn, m.ern, m.bottom, m.uval,
            CAST(SUM(CASE WHEN x.value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_below50
          FROM m JOIN dr x ON x.user_id = m.user_id AND x.rn BETWEEN m.prn AND m.ern
          GROUP BY m.user_id, m.prn, m.ern, m.bottom, m.uval)
        SELECT t.user_id,
          ROW_NUMBER() OVER (PARTITION BY t.user_id ORDER BY t.prn) AS match_num,
          STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
          CAST(t.ern - t.prn + 1 AS BIGINT) AS n_down,
          t.bottom, t.uval AS rebound, t.n_below50
        FROM meas t JOIN d p ON p.user_id = t.user_id AND p.rn = t.prn""")),

    // ------------------------------------------------------------------
    // CLASSIFIER() / MATCH_NUMBER() inside DEFINE (round 11, the
    // dialect's last named rejection closed): B admits only when the
    // physical predecessor's in-flight label is 'A' — so greedy B+
    // collapses to EXACTLY one row (a second B sees PREV(CLASSIFIER())
    // = 'B') — and only while the in-flight match number is <= 3.
    // Oracle closed form (proven against the matcher on random streams
    // in PatternMatchSpec): matches are (drop row p, successor p+1)
    // pairs consumed left to right with SKIP PAST LAST ROW. A
    // successor row is either the next drop of the SAME maximal
    // drop-run or a non-drop row, so runs pair independently, and
    // within a maximal run of consecutive drop positions [s..e] the
    // match starts are exactly s, s+2, s+4, ... (each match eats two
    // rows; a start needs a successor row, i.e. p < the partition's
    // row count). MATCH_NUMBER() is monotone per partition, so the
    // <= 3 gate truncates to the first three matches and can never
    // resurrect a later one.
    QueryEntry("q38_pattern_define_classifier",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("mr_events")
        s.sql("""
          SELECT * FROM (
            SELECT user_id, ts, event_id, value,
                   date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            FROM mr_events WHERE event_type = 'purchase'
          ) MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.ts_s) AS start_ts, A.value AS drop_v,
              B.value AS next_v
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+)
            DEFINE A AS A.value < PREV(A.value),
                   B AS PREV(CLASSIFIER()) = 'A' AND MATCH_NUMBER() <= 3
          )""")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        d AS (SELECT user_id, ts, event_id, value,
            value - LAG(value) OVER w AS delta,
            ROW_NUMBER() OVER w AS rn,
            COUNT(*) OVER (PARTITION BY user_id) AS nrows
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        dr AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM d WHERE delta < 0),
        runs AS (SELECT user_id, grp, MIN(rn) AS srn FROM dr GROUP BY user_id, grp),
        starts AS (SELECT dr.user_id, dr.rn AS p
          FROM dr JOIN runs ON runs.user_id = dr.user_id AND runs.grp = dr.grp
          WHERE (dr.rn - runs.srn) % 2 = 0 AND dr.rn < dr.nrows),
        m AS (SELECT user_id, p,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY p) AS match_num
          FROM starts)
        SELECT m.user_id, m.match_num,
          STRFTIME(a.ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
          a.value AS drop_v, b.value AS next_v
        FROM m
        JOIN d a ON a.user_id = m.user_id AND a.rn = m.p
        JOIN d b ON b.user_id = m.user_id AND b.rn = m.p + 1
        WHERE m.match_num <= 3""")),

    // ------------------------------------------------------------------
    // SQL UNPIVOT clause (round 11): columns-to-rows through Spark's
    // native UNPIVOT (Expand-planned — one pass, no self-union rescan),
    // then a per-metric rollup. The oracle spells the same relation as
    // the portable UNION ALL (DuckDB's UNPIVOT syntax differs across
    // versions; the relation is what's being checked).
    QueryEntry("q39_unpivot",
      (s, d) => {
        t(s, d, "part").createOrReplaceTempView("unpivot_part")
        s.sql("""
          SELECT metric, COUNT(*) AS n,
                 CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total,
                 MIN(val) AS min_v, MAX(val) AS max_v
          FROM (
            SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
                   p_retailprice AS retailprice
            FROM unpivot_part
          ) UNPIVOT (val FOR metric IN (size, retailprice))
          GROUP BY metric""")
      },
      Some("""WITH u AS (
          SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
          UNION ALL
          SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part)
        SELECT metric, COUNT(*) AS n,
          CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total,
          MIN(val) AS min_v, MAX(val) AS max_v
        FROM u GROUP BY metric""")),

    // ------------------------------------------------------------------
    // SQL:2016 window frame EXCLUSION (EXCLUDE GROUP / TIES / CURRENT
    // ROW) over a GROUPS frame — Spark supports neither the exclusion
    // clause nor GROUPS frames. Windows.withGroupsFrameExclude rebuilds
    // the excluded frame from static split frames in dense_rank space
    // ([lo,-1] ∪ [+1,hi] plus a peers-minus-self piece), every window
    // over the same (suppkey, rank) ordering -> ONE exchange for the
    // whole matrix. The oracle is DuckDB's NATIVE `RANGE ... EXCLUDE`
    // evaluated over the identical dense_rank space (GROUPS-over-k ==
    // RANGE-over-dense_rank(k)), so the emulation is checked against a
    // real implementation of the standard, not against itself.
    // Sums route through DECIMAL(38,6) (float-parity discipline);
    // MIN/MAX/COUNT are exact; AVG is spelled exact-sum/count in both.
    QueryEntry("q40_frame_exclude",
      (s, d) => {
        import graft.functions.Windows._
        val li = t(s, d, "lineitem")
          .filter(col("l_suppkey") <= 20)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            col("l_quantity").cast(IntegerType).as("q"),
            col("l_extendedprice").cast(D).as("p"))
        val pb = Seq(col("l_suppkey")); val ob = Seq(col("q"))
        var out: DataFrame = li
        out = withGroupsFrameExclude(out, "sum_eg", "sum", col("p"), pb, ob, -1, 1, ExcludeGroup)
        out = withGroupsFrameExclude(out, "min_et", "min", col("p"), pb, ob, -1, 1, ExcludeTies)
        out = withGroupsFrameExclude(out, "cnt_ec", "count", lit(1), pb, ob, -1, 1, ExcludeCurrentRow)
        out = withGroupsFrameExclude(out, "min_ec", "min", col("p"), pb, ob, -1, 1, ExcludeCurrentRow)
        out = withGroupsFrameExclude(out, "avg_eg", "avg", col("p"), pb, ob, -2, 2, ExcludeGroup)
        out.select(col("l_orderkey"), col("l_linenumber"),
          col("sum_eg").cast(DoubleType).as("sum_eg"),
          col("min_et").cast(DoubleType).as("min_et"),
          col("cnt_ec"),
          col("min_ec").cast(DoubleType).as("min_ec"),
          round(col("avg_eg"), 6).as("avg_eg"))
      },
      Some("""WITH g AS (
          SELECT l_orderkey, l_linenumber, l_suppkey,
                 CAST(l_extendedprice AS DECIMAL(38,6)) AS p,
                 DENSE_RANK() OVER (PARTITION BY l_suppkey
                   ORDER BY CAST(l_quantity AS INT)) AS r
          FROM lineitem WHERE l_suppkey <= 20)
        SELECT l_orderkey, l_linenumber,
          CAST(SUM(p) OVER (PARTITION BY l_suppkey ORDER BY r
            RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)
            AS DOUBLE) AS sum_eg,
          CAST(MIN(p) OVER (PARTITION BY l_suppkey ORDER BY r
            RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)
            AS DOUBLE) AS min_et,
          COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY r
            RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)
            AS cnt_ec,
          CAST(MIN(p) OVER (PARTITION BY l_suppkey ORDER BY r
            RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)
            AS DOUBLE) AS min_ec,
          ROUND(CAST(SUM(p) OVER (PARTITION BY l_suppkey ORDER BY r
              RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)
              AS DOUBLE)
            / COUNT(p) OVER (PARTITION BY l_suppkey ORDER BY r
              RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 6)
            AS avg_eg
        FROM g""")),

    // ------------------------------------------------------------------
    // SQL/JSON JSON_TABLE (round 12, sql/JsonTableSql.scala): Trino's
    // table function through plain spark.sql (injected parser, same
    // seam as MATCH_RECOGNIZE). Self-inverting oracle: each order's
    // lines serialize into ONE JSON array document (sort_array makes
    // the element order — and with it FOR ORDINALITY — deterministic
    // via the struct's (ln, qty) field order; collect_list alone is
    // partition-order, and the FIXTURE's l_linenumber is NOT unique
    // per order, so the oracle tie-breaks on qty too), then JSON_TABLE
    // flattens
    // the documents back to typed rows, so the oracle is the original
    // relation with a ROW_NUMBER ordinal. Lowered plan: one
    // Generate(explode) over from_json — no UDFs, no reparse per
    // column (get_json_object on the same element folds to one parse).
    QueryEntry("q41_json_table",
      (s, d) => {
        t(s, d, "lineitem").filter(col("l_orderkey") <= 600)
          .createOrReplaceTempView("jt_lineitem")
        s.sql("""
          WITH docs AS (
            SELECT l_orderkey AS okey,
                   to_json(sort_array(collect_list(
                     named_struct('ln', l_linenumber, 'qty', l_quantity)))) AS doc
            FROM jt_lineitem GROUP BY l_orderkey)
          SELECT d.okey, jt.pos, jt.ln, jt.qty
          FROM docs d, JSON_TABLE(d.doc, 'lax $[*]'
            COLUMNS (pos FOR ORDINALITY,
                     ln INTEGER PATH 'lax $.ln',
                     qty DOUBLE PATH 'lax $.qty')) AS jt""")
      },
      Some("""SELECT l_orderkey AS okey,
            CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity) AS INT) AS pos,
            l_linenumber AS ln, l_quantity AS qty
          FROM lineitem WHERE l_orderkey <= 600""")),

    // ------------------------------------------------------------------
    // Trino UNNEST relation (round 12, sql/UnnestSql.scala) — multi-
    // array zip + WITH ORDINALITY through plain spark.sql: pack each
    // order's line numbers and quantities into two PARALLEL arrays
    // (array_sort over the struct pairs keeps them aligned AND makes
    // the order deterministic, same (ln, qty) tie-break as q41), then
    // UNNEST(lns, qtys) WITH ORDINALITY re-flattens them zipped — the
    // oracle is the original relation with a ROW_NUMBER ordinal
    // (BIGINT, Trino's ordinality type).
    QueryEntry("q42_unnest_ordinality",
      (s, d) => {
        t(s, d, "lineitem").filter(col("l_orderkey") <= 600)
          .createOrReplaceTempView("un_lineitem")
        s.sql("""
          WITH packed AS (
            SELECT l_orderkey AS okey,
                   array_sort(collect_list(
                     named_struct('ln', l_linenumber, 'qty', l_quantity))) AS rs
            FROM un_lineitem GROUP BY l_orderkey),
          arrs AS (
            SELECT okey, transform(rs, r -> r.ln) AS lns,
                   transform(rs, r -> r.qty) AS qtys
            FROM packed)
          SELECT a.okey, u.pos, u.ln, u.qty
          FROM arrs a CROSS JOIN UNNEST(a.lns, a.qtys)
            WITH ORDINALITY AS u(ln, qty, pos)""")
      },
      Some("""SELECT l_orderkey AS okey,
            ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity) AS pos,
            l_linenumber AS ln, l_quantity AS qty
          FROM lineitem WHERE l_orderkey <= 600""")),

    // ------------------------------------------------------------------
    // Trino UNNEST over an ARRAY OF ROWS (round 13, closing the r12
    // advice gap properly): >= 3 alias columns make the shape
    // unambiguous to the type-blind rewriter (a map yields exactly 2),
    // and the lowering splats the unknown struct fields positionally
    // (`__un_e.*`) with the alias's POSITIONAL column list doing the
    // renaming. Same pack/flatten self-inversion as q42, now with the
    // rows kept as rows — the oracle is the original relation with a
    // per-order ordinal.
    QueryEntry("q44_unnest_rows",
      (s, d) => {
        t(s, d, "lineitem").filter(col("l_orderkey") <= 600)
          .createOrReplaceTempView("ur_lineitem")
        s.sql("""
          WITH packed AS (
            SELECT l_orderkey AS okey,
                   array_sort(collect_list(named_struct(
                     'ln', l_linenumber, 'qty', l_quantity,
                     'price', l_extendedprice))) AS rs
            FROM ur_lineitem GROUP BY l_orderkey)
          SELECT p.okey, u.ln, u.qty, u.price, u.pos
          FROM packed p CROSS JOIN UNNEST(p.rs)
            WITH ORDINALITY AS u(ln, qty, price, pos)""")
      },
      Some("""SELECT l_orderkey AS okey, l_linenumber AS ln, l_quantity AS qty,
            l_extendedprice AS price,
            ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice) AS pos
          FROM lineitem WHERE l_orderkey <= 600""")),

    // ------------------------------------------------------------------
    // JSON_TABLE NESTED PATH (round 13, r12 verdict #5): two-level
    // documents — each customer's orders as a JSON array, each order
    // carrying a nested lines array — flattened by ONE JSON_TABLE with
    // a NESTED PATH COLUMNS block. The lines array keeps only
    // l_quantity < 10, so some orders have NO qualifying lines and
    // exercise the SQL:2016 DEFAULT plan the lowering implements
    // (OUTER parent/child: those orders emit one row with NULL
    // ln/qty/lpos — Trino 468's default too). to_json omits null
    // struct fields, so a line-less order's element has no "lines" key
    // and posexplode_outer pads it. Oracle: the ORIGINAL relation,
    // orders LEFT JOIN the filtered lines with a per-order ordinal
    // (CASE-nulled on the unmatched row). Deterministic: sort_array
    // orders both levels ((okey) unique; (ln, qty) the q41 tie-break).
    QueryEntry("q43_json_table_nested",
      (s, d) => {
        t(s, d, "orders").filter(col("o_orderkey") <= 600)
          .createOrReplaceTempView("jt2_orders")
        t(s, d, "lineitem").filter(col("l_orderkey") <= 600)
          .createOrReplaceTempView("jt2_lineitem")
        s.sql("""
          WITH lines AS (
            SELECT l_orderkey,
                   sort_array(collect_list(
                     named_struct('ln', l_linenumber, 'qty', l_quantity))) AS ls
            FROM jt2_lineitem WHERE l_quantity < 10 GROUP BY l_orderkey),
          docs AS (
            SELECT o.o_custkey AS ck,
                   to_json(sort_array(collect_list(
                     named_struct('okey', o.o_orderkey, 'lines', l.ls)))) AS doc
            FROM jt2_orders o LEFT JOIN lines l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey)
          SELECT d.ck, jt.okey, jt.lpos, jt.ln, jt.qty
          FROM docs d, JSON_TABLE(d.doc, 'lax $[*]'
            COLUMNS (okey BIGINT PATH 'lax $.okey',
                     NESTED PATH 'lax $.lines[*]' COLUMNS (
                       lpos FOR ORDINALITY,
                       ln INTEGER PATH 'lax $.ln',
                       qty DOUBLE PATH 'lax $.qty'))) AS jt""")
      },
      Some("""WITH sel AS (
          SELECT l_orderkey, l_linenumber, l_quantity
          FROM lineitem WHERE l_quantity < 10 AND l_orderkey <= 600)
        SELECT o.o_custkey AS ck, o.o_orderkey AS okey,
          CASE WHEN s.l_orderkey IS NULL THEN NULL
               ELSE CAST(ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                    ORDER BY s.l_linenumber, s.l_quantity) AS INT) END AS lpos,
          s.l_linenumber AS ln, s.l_quantity AS qty
        FROM orders o LEFT JOIN sel s ON s.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey <= 600""")),

    // ------------------------------------------------------------------
    // JSON_TABLE NESTED CHAIN (round 13): THREE levels — customers'
    // orders, each order's lines, each line's tags (tags synthesized as
    // (i·10 for i < ln), so a line with ln = 1 has an EMPTY tags array
    // and exercises the innermost OUTER padding; per-level FOR
    // ORDINALITY = the tag's index by construction, which the oracle
    // re-derives with a number-table LEFT JOIN). One JSON_TABLE, one
    // lowered chain of LATERAL VIEW OUTER generates — no second
    // JSON_TABLE needed for the second level.
    QueryEntry("q45_json_table_deep",
      (s, d) => {
        t(s, d, "orders").filter(col("o_orderkey") <= 400)
          .createOrReplaceTempView("jt3_orders")
        t(s, d, "lineitem").filter(col("l_orderkey") <= 400)
          .createOrReplaceTempView("jt3_lineitem")
        s.sql("""
          WITH lines AS (
            SELECT l_orderkey,
                   sort_array(collect_list(named_struct(
                     'ln', l_linenumber, 'qty', l_quantity,
                     'tags', CASE WHEN l_linenumber > 1
                                  THEN transform(sequence(1, l_linenumber - 1), i -> i * 10)
                                  ELSE CAST(array() AS array<int>) END))) AS ls
            FROM jt3_lineitem GROUP BY l_orderkey),
          docs AS (
            SELECT o.o_custkey AS ck,
                   to_json(sort_array(collect_list(named_struct(
                     'okey', o.o_orderkey, 'lines', l.ls)))) AS doc
            FROM jt3_orders o JOIN lines l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey)
          SELECT d.ck, jt.okey, jt.ln, jt.qty, jt.tpos, jt.tag
          FROM docs d, JSON_TABLE(d.doc, 'lax $[*]'
            COLUMNS (okey BIGINT PATH 'lax $.okey',
                     NESTED PATH 'lax $.lines[*]' COLUMNS (
                       ln INTEGER PATH 'lax $.ln',
                       qty DOUBLE PATH 'lax $.qty',
                       NESTED PATH 'lax $.tags[*]' COLUMNS (
                         tpos FOR ORDINALITY,
                         tag INTEGER PATH 'lax $')))) AS jt""")
      },
      Some("""WITH li AS (
          SELECT l_orderkey, l_linenumber AS ln, l_quantity AS qty
          FROM lineitem WHERE l_orderkey <= 400),
        base AS (
          SELECT o.o_custkey AS ck, o.o_orderkey AS okey, li.ln, li.qty
          FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey <= 400),
        nums AS (SELECT CAST(n AS INT) AS n FROM range(1, 8) r(n))
        SELECT b.ck, b.okey, b.ln, b.qty,
          t.n AS tpos, t.n * 10 AS tag
        FROM base b LEFT JOIN nums t ON t.n < b.ln""")),

    // ------------------------------------------------------------------
    // JSON_TABLE SIBLING NESTED paths — the SQL:2016 default UNION plan
    // (round 13): each order carries TWO sibling arrays (its qualifying
    // lines and a synthesized tags list, count = okey % 3), and ONE
    // JSON_TABLE emits the union — lines rows with tag columns NULL,
    // tags rows with line columns NULL, and orders where BOTH arrays
    // are empty get one fully-padded row (the OUTER parent under a
    // UNION of empty siblings). The oracle spells the plan literally:
    // two legs UNION ALL a NOT-EXISTS padding leg.
    QueryEntry("q46_json_table_siblings",
      (s, d) => {
        t(s, d, "orders").filter(col("o_orderkey") <= 600)
          .createOrReplaceTempView("jt4_orders")
        t(s, d, "lineitem").filter(col("l_orderkey") <= 600)
          .createOrReplaceTempView("jt4_lineitem")
        s.sql("""
          WITH li AS (
            SELECT l_orderkey,
                   sort_array(collect_list(named_struct('ln', l_linenumber))) AS ls
            FROM jt4_lineitem WHERE l_quantity < 5 GROUP BY l_orderkey),
          docs AS (
            SELECT o.o_custkey AS ck,
                   to_json(sort_array(collect_list(named_struct(
                     'okey', o.o_orderkey,
                     'lines', li.ls,
                     'tags', CASE WHEN o.o_orderkey % 3 > 0
                                  THEN transform(sequence(1, CAST(o.o_orderkey % 3 AS INT)), i -> i * 10)
                                  ELSE CAST(array() AS array<int>) END)))) AS doc
            FROM jt4_orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey)
          SELECT d.ck, jt.okey, jt.lpos, jt.ln, jt.tpos, jt.tag
          FROM docs d, JSON_TABLE(d.doc, 'lax $[*]'
            COLUMNS (okey BIGINT PATH 'lax $.okey',
                     NESTED PATH 'lax $.lines[*]' COLUMNS (
                       lpos FOR ORDINALITY, ln INTEGER PATH 'lax $.ln'),
                     NESTED PATH 'lax $.tags[*]' COLUMNS (
                       tpos FOR ORDINALITY, tag INTEGER PATH 'lax $'))) AS jt""")
      },
      Some("""WITH li0 AS (
          SELECT l_orderkey, l_linenumber AS ln
          FROM lineitem WHERE l_quantity < 5 AND l_orderkey <= 600),
        o AS (SELECT o_custkey AS ck, o_orderkey AS okey,
                CAST(o_orderkey % 3 AS INT) AS ntags
              FROM orders WHERE o_orderkey <= 600),
        lineleg AS (
          SELECT o.ck, o.okey,
            CAST(ROW_NUMBER() OVER (PARTITION BY o.okey ORDER BY li0.ln) AS INT) AS lpos,
            li0.ln, CAST(NULL AS INT) AS tpos, CAST(NULL AS INT) AS tag
          FROM o JOIN li0 ON li0.l_orderkey = o.okey),
        nums AS (SELECT CAST(n AS INT) AS n FROM range(1, 3) r(n)),
        tagleg AS (
          SELECT o.ck, o.okey, CAST(NULL AS INT) AS lpos, CAST(NULL AS INT) AS ln,
            t.n AS tpos, t.n * 10 AS tag
          FROM o JOIN nums t ON t.n <= o.ntags),
        pad AS (
          SELECT o.ck, o.okey, CAST(NULL AS INT) AS lpos, CAST(NULL AS INT) AS ln,
            CAST(NULL AS INT) AS tpos, CAST(NULL AS INT) AS tag
          FROM o WHERE o.ntags = 0
            AND NOT EXISTS (SELECT 1 FROM li0 WHERE li0.l_orderkey = o.okey))
        SELECT * FROM lineleg
        UNION ALL SELECT * FROM tagleg
        UNION ALL SELECT * FROM pad""")),

    // ------------------------------------------------------------------
    // JSON_TABLE PLAN clause, INNER parent/child (round 14, r13 verdict
    // #1): same two-level shape as q43 (orders with their qty < 10
    // lines packed to per-customer docs), but the explicit
    // `PLAN (r INNER l)` drops order elements with NO qualifying lines
    // instead of OUTER-padding them — the oracle is the plain INNER
    // JOIN. Path names come from the new `AS <name>` clauses.
    QueryEntry("q47_json_table_plan_inner",
      (s, d) => {
        t(s, d, "orders").filter(col("o_orderkey") <= 600)
          .createOrReplaceTempView("jt5_orders")
        t(s, d, "lineitem").filter(col("l_orderkey") <= 600)
          .createOrReplaceTempView("jt5_lineitem")
        s.sql("""
          WITH lines AS (
            SELECT l_orderkey,
                   sort_array(collect_list(
                     named_struct('ln', l_linenumber, 'qty', l_quantity))) AS ls
            FROM jt5_lineitem WHERE l_quantity < 10 GROUP BY l_orderkey),
          docs AS (
            SELECT o.o_custkey AS ck,
                   to_json(sort_array(collect_list(
                     named_struct('okey', o.o_orderkey, 'lines', l.ls)))) AS doc
            FROM jt5_orders o LEFT JOIN lines l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey)
          SELECT d.ck, jt.okey, jt.lpos, jt.ln, jt.qty
          FROM docs d, JSON_TABLE(d.doc, 'lax $[*]' AS r
            COLUMNS (okey BIGINT PATH 'lax $.okey',
                     NESTED PATH 'lax $.lines[*]' AS l COLUMNS (
                       lpos FOR ORDINALITY,
                       ln INTEGER PATH 'lax $.ln',
                       qty DOUBLE PATH 'lax $.qty'))
            PLAN (r INNER l)) AS jt""")
      },
      Some("""WITH sel AS (
          SELECT l_orderkey, l_linenumber, l_quantity
          FROM lineitem WHERE l_quantity < 10 AND l_orderkey <= 600)
        SELECT o.o_custkey AS ck, o.o_orderkey AS okey,
          CAST(ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
               ORDER BY s.l_linenumber, s.l_quantity) AS INT) AS lpos,
          s.l_linenumber AS ln, s.l_quantity AS qty
        FROM orders o JOIN sel s ON s.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey <= 600""")),

    // ------------------------------------------------------------------
    // JSON_TABLE siblings BELOW the outermost block (round 14, r13
    // verdict #2 — both r13 restrictions lifted): each order's lines
    // array is the first nested level, and each LINE carries two
    // sibling arrays — tags (i·10 for i < ln, as q45) and notes (one
    // "n<ln>" entry on even lines) — combined by the default UNION
    // plan INSIDE a nested block. A line with ln = 1 has neither array
    // and OUTER-pads one row. The oracle spells the per-line union:
    // a tag leg (number table), a note leg (even lines), and a pad leg
    // (ln = 1).
    QueryEntry("q48_json_table_deep_siblings",
      (s, d) => {
        t(s, d, "orders").filter(col("o_orderkey") <= 400)
          .createOrReplaceTempView("jt6_orders")
        t(s, d, "lineitem").filter(col("l_orderkey") <= 400)
          .createOrReplaceTempView("jt6_lineitem")
        s.sql("""
          WITH lines AS (
            SELECT l_orderkey,
                   sort_array(collect_list(named_struct(
                     'ln', l_linenumber,
                     'tags', CASE WHEN l_linenumber > 1
                                  THEN transform(sequence(1, l_linenumber - 1), i -> i * 10)
                                  ELSE CAST(array() AS array<int>) END,
                     'notes', CASE WHEN l_linenumber % 2 = 0
                                   THEN array(concat('n', CAST(l_linenumber AS STRING)))
                                   ELSE CAST(array() AS array<string>) END))) AS ls
            FROM jt6_lineitem GROUP BY l_orderkey),
          docs AS (
            SELECT o.o_custkey AS ck,
                   to_json(sort_array(collect_list(named_struct(
                     'okey', o.o_orderkey, 'lines', l.ls)))) AS doc
            FROM jt6_orders o JOIN lines l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey)
          SELECT d.ck, jt.okey, jt.ln, jt.tpos, jt.tag, jt.note
          FROM docs d, JSON_TABLE(d.doc, 'lax $[*]'
            COLUMNS (okey BIGINT PATH 'lax $.okey',
                     NESTED PATH 'lax $.lines[*]' COLUMNS (
                       ln INTEGER PATH 'lax $.ln',
                       NESTED PATH 'lax $.tags[*]' COLUMNS (
                         tpos FOR ORDINALITY,
                         tag INTEGER PATH 'lax $'),
                       NESTED PATH 'lax $.notes[*]' COLUMNS (
                         note VARCHAR PATH 'lax $')))) AS jt""")
      },
      Some("""WITH base AS (
          SELECT o.o_custkey AS ck, o.o_orderkey AS okey,
                 l.l_linenumber AS ln
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey <= 400),
        nums AS (SELECT CAST(n AS INT) AS n FROM range(1, 8) r(n)),
        tagleg AS (
          SELECT b.ck, b.okey, b.ln, t.n AS tpos, t.n * 10 AS tag,
                 CAST(NULL AS VARCHAR) AS note
          FROM base b JOIN nums t ON t.n < b.ln),
        noteleg AS (
          SELECT ck, okey, ln, CAST(NULL AS INT) AS tpos,
                 CAST(NULL AS INT) AS tag, 'n' || CAST(ln AS VARCHAR) AS note
          FROM base WHERE ln % 2 = 0),
        padleg AS (
          SELECT ck, okey, ln, CAST(NULL AS INT) AS tpos,
                 CAST(NULL AS INT) AS tag, CAST(NULL AS VARCHAR) AS note
          FROM base WHERE ln = 1)
        SELECT * FROM tagleg
        UNION ALL SELECT * FROM noteleg
        UNION ALL SELECT * FROM padleg""")),

    // ------------------------------------------------------------------
    // JSON_TABLE PLAN CROSS siblings (round 14): the q46 document shape
    // (each order carries a lines array and a tags array), but the
    // explicit `PLAN (r OUTER (l CROSS g))` combines the siblings as a
    // CROSS product instead of the default UNION — every (line, tag)
    // pair per order; an order where EITHER array is empty has an
    // empty product and the OUTER parent edge pads ONE all-NULL row.
    // The oracle spells exactly that: an inner-join product leg plus
    // an either-empty padding leg.
    QueryEntry("q49_json_table_plan_cross",
      (s, d) => {
        t(s, d, "orders").filter(col("o_orderkey") <= 600)
          .createOrReplaceTempView("jt7_orders")
        t(s, d, "lineitem").filter(col("l_orderkey") <= 600)
          .createOrReplaceTempView("jt7_lineitem")
        s.sql("""
          WITH li AS (
            SELECT l_orderkey,
                   sort_array(collect_list(named_struct('ln', l_linenumber))) AS ls
            FROM jt7_lineitem WHERE l_quantity < 5 GROUP BY l_orderkey),
          docs AS (
            SELECT o.o_custkey AS ck,
                   to_json(sort_array(collect_list(named_struct(
                     'okey', o.o_orderkey,
                     'lines', li.ls,
                     'tags', CASE WHEN o.o_orderkey % 3 > 0
                                  THEN transform(sequence(1, CAST(o.o_orderkey % 3 AS INT)), i -> i * 10)
                                  ELSE CAST(array() AS array<int>) END)))) AS doc
            FROM jt7_orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey)
          SELECT d.ck, jt.okey, jt.lpos, jt.ln, jt.tpos, jt.tag
          FROM docs d, JSON_TABLE(d.doc, 'lax $[*]' AS r
            COLUMNS (okey BIGINT PATH 'lax $.okey',
                     NESTED PATH 'lax $.lines[*]' AS l COLUMNS (
                       lpos FOR ORDINALITY, ln INTEGER PATH 'lax $.ln'),
                     NESTED PATH 'lax $.tags[*]' AS g COLUMNS (
                       tpos FOR ORDINALITY, tag INTEGER PATH 'lax $'))
            PLAN (r OUTER (l CROSS g))) AS jt""")
      },
      Some("""WITH li0 AS (
          SELECT l_orderkey, l_linenumber AS ln,
            CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS INT) AS lpos
          FROM lineitem WHERE l_quantity < 5 AND l_orderkey <= 600),
        o AS (SELECT o_custkey AS ck, o_orderkey AS okey,
                CAST(o_orderkey % 3 AS INT) AS ntags
              FROM orders WHERE o_orderkey <= 600),
        nums AS (SELECT CAST(n AS INT) AS n FROM range(1, 3) r(n)),
        product AS (
          SELECT o.ck, o.okey, li0.lpos, li0.ln, t.n AS tpos, t.n * 10 AS tag
          FROM o
          JOIN li0 ON li0.l_orderkey = o.okey
          JOIN nums t ON t.n <= o.ntags),
        pad AS (
          SELECT o.ck, o.okey, CAST(NULL AS INT) AS lpos, CAST(NULL AS INT) AS ln,
            CAST(NULL AS INT) AS tpos, CAST(NULL AS INT) AS tag
          FROM o WHERE o.ntags = 0
            OR NOT EXISTS (SELECT 1 FROM li0 WHERE li0.l_orderkey = o.okey))
        SELECT * FROM product
        UNION ALL SELECT * FROM pad"""))
  )
}
