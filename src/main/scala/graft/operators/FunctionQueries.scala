package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryEntry, Tables}

/** Scalar-function-family coverage (SURVEY.md §2.4): strings, regex,
  * date/time, math, arrays + higher-order functions, JSON, conditional,
  * casts, hashing, percentiles. All codegen'd built-ins — no UDFs.
  */
object FunctionQueries {

  val entries: Seq[QueryEntry] = Seq(

    // ------------------------------------------------------------------
    // (f01 retired in r5: it was f02 minus the oracle — lower/trim are
    // folded into f02 so every string function keeps a checked entry.)
    QueryEntry("f02_string_funcs_oracle",
      (s, d) => {
        Tables(s, d, "customer").filter(col("c_custkey") <= 200).select(
          col("c_custkey"),
          concat(lit("cust:"), col("c_name")).as("tagged"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          trim(lit("  pad  ")).as("trimmed"),
          substring(col("c_name"), 2, 5).as("sub"),
          regexp_replace(col("c_name"), "_", "-").as("dashed"),
          length(col("c_name")).as("len"),
          locate("1", col("c_name")).as("pos1"),
          lpad(col("c_custkey").cast(StringType), 8, "0").as("padded"),
          reverse(col("c_name")).as("rev"),
          element_at(split(col("c_name"), "_"), -1).as("last_part"))
      },
      Some("""SELECT c_custkey,
        'cust:' || c_name AS tagged,
        UPPER(c_name) AS up,
        LOWER(c_name) AS lo,
        TRIM('  pad  ') AS trimmed,
        SUBSTRING(c_name, 2, 5) AS sub,
        REGEXP_REPLACE(c_name, '_', '-', 'g') AS dashed,
        LENGTH(c_name) AS len,
        STRPOS(c_name, '1') AS pos1,
        LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        REVERSE(c_name) AS rev,
        STRING_SPLIT(c_name, '_')[-1] AS last_part
        FROM customer WHERE c_custkey <= 200""")),

    // ------------------------------------------------------------------
    QueryEntry("f03_regex",
      (s, d) => {
        Tables(s, d, "part").select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"),
          col("p_name").rlike("^(red|blue)").as("is_primary"))
      },
      Some("""SELECT p_partkey,
        REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
        REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS starred,
        REGEXP_MATCHES(p_name, '^(red|blue)') AS is_primary
        FROM part""")),

    // ------------------------------------------------------------------
    QueryEntry("f04_datetime",
      (s, d) => {
        Tables(s, d, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"),
          date_trunc("month", col("o_orderdate")).cast(DateType).cast(StringType).as("month_start"),
          date_add(col("o_orderdate").cast(DateType), 90).cast(StringType).as("due_date"),
          last_day(col("o_orderdate")).cast(StringType).as("eom"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"))
      },
      Some("""SELECT o_orderkey,
        EXTRACT(YEAR FROM o_orderdate) AS yr,
        EXTRACT(MONTH FROM o_orderdate) AS mo,
        EXTRACT(DAY FROM o_orderdate) AS dom,
        EXTRACT(QUARTER FROM o_orderdate) AS qtr,
        DAYOFWEEK(o_orderdate) AS dow,
        CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS VARCHAR) AS due_date,
        CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
        STRFTIME(o_orderdate, '%Y-%m-%d') AS fmt
        FROM orders""")),

    // ------------------------------------------------------------------
    QueryEntry("f05_datediff",
      (s, d) => {
        val ord = Tables(s, d, "orders")
        val li = Tables(s, d, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            datediff(col("l_shipdate").cast(DateType), col("o_orderdate").cast(DateType))
              .as("ship_days"))
          .filter(col("ship_days") > 60)
      },
      Some("""SELECT l_orderkey, l_linenumber,
        DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS ship_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60""")),

    // ------------------------------------------------------------------
    QueryEntry("f06_math",
      (s, d) => {
        Tables(s, d, "part").select(
          col("p_partkey"),
          abs(col("p_retailprice") - 1000).as("abs_diff"),
          ceil(col("p_retailprice")).as("ceil_p"),
          floor(col("p_retailprice")).as("floor_p"),
          round(sqrt(col("p_retailprice")), 6).as("sqrt_p"),
          round(exp(col("p_size").cast(DoubleType) / 25.0), 6).as("exp_s"),
          round(log(col("p_retailprice")), 6).as("ln_p"),
          round(log10(col("p_retailprice")), 6).as("log10_p"),
          round(pow(col("p_size"), 2.0), 1).as("size_sq"),
          pmod(col("p_partkey"), lit(7)).as("mod7"),
          signum(col("p_retailprice") - 1000).as("sign_p"),
          greatest(col("p_size"), lit(25)).as("gr"),
          least(col("p_size"), lit(25)).as("ls"),
          width_bucket(col("p_retailprice"), lit(0.0), lit(2000.0), lit(10)).as("wb"))
      },
      Some("""SELECT p_partkey,
        ABS(p_retailprice - 1000) AS abs_diff,
        CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_p,
        CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_p,
        ROUND(SQRT(p_retailprice), 6) AS sqrt_p,
        ROUND(EXP(CAST(p_size AS DOUBLE) / 25.0), 6) AS exp_s,
        ROUND(LN(p_retailprice), 6) AS ln_p,
        ROUND(LOG10(p_retailprice), 6) AS log10_p,
        ROUND(POW(p_size, 2.0), 1) AS size_sq,
        p_partkey % 7 AS mod7,
        CAST(SIGN(p_retailprice - 1000) AS DOUBLE) AS sign_p,
        CAST(GREATEST(p_size, 25) AS INT) AS gr,
        CAST(LEAST(p_size, 25) AS INT) AS ls,
        CAST(CASE WHEN p_retailprice < 0 THEN 0
                  WHEN p_retailprice >= 2000 THEN 11
                  ELSE FLOOR(p_retailprice / 200.0) + 1 END AS BIGINT) AS wb
        FROM part""")),

    // ------------------------------------------------------------------
    QueryEntry("f07_array_hof",
      (s, d) => {
        val base = Tables(s, d, "part").select(
          col("p_partkey"),
          sequence(lit(1), pmod(col("p_size"), lit(5)) + 2).as("arr"))
        base.select(
          col("p_partkey"),
          size(col("arr")).as("n"),
          aggregate(transform(col("arr"), x => x * x), lit(0),
            (acc, x) => acc + x).as("sum_sq"),
          size(filter(col("arr"), x => x % 2 === 0)).as("n_even"),
          array_join(transform(col("arr"), x => x.cast(StringType)), "-").as("joined"),
          array_contains(col("arr"), 3).as("has3"),
          element_at(col("arr"), 1).as("first_el"),
          array_max(col("arr")).as("mx"),
          array_min(col("arr")).as("mn"))
      },
      Some("""WITH base AS (
          SELECT p_partkey, GENERATE_SERIES(1, p_size % 5 + 2) AS arr FROM part)
        SELECT p_partkey,
          CAST(LEN(arr) AS INT) AS n,
          CAST(LIST_SUM(LIST_TRANSFORM(arr, x -> x * x)) AS INT) AS sum_sq,
          CAST(LEN(LIST_FILTER(arr, x -> x % 2 = 0)) AS INT) AS n_even,
          ARRAY_TO_STRING(LIST_TRANSFORM(arr, x -> CAST(x AS VARCHAR)), '-') AS joined,
          LIST_CONTAINS(arr, 3) AS has3,
          CAST(arr[1] AS INT) AS first_el,
          CAST(LIST_MAX(arr) AS INT) AS mx,
          CAST(LIST_MIN(arr) AS INT) AS mn
        FROM base""")),

    // ------------------------------------------------------------------
    QueryEntry("f08_conditional",
      (s, d) => {
        Tables(s, d, "orders").select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_x"),
          try_divide(col("o_totalprice"), col("o_orderkey") % 3).as("risky_div"),
          // try_cast pays a CONSTRUCTED-AND-CAUGHT exception per failing
          // row (~7.5us each, measured at sf1 — Spark formats the ANSI
          // error before TRY swallows it), so the demo parses the
          // priority DIGIT and lets 1/1000 rows hit the full unparseable
          // string: NULL-on-failure semantics stay visible, cost scales
          // with failures (the production contract for dirty columns —
          // try_cast over a column that NEVER parses ran 11 s/1.5M rows)
          expr("""try_cast(CASE WHEN o_orderkey % 1000 = 0 THEN o_orderpriority
                    ELSE substring(o_orderpriority, 1, 1) END AS INT)""").as("prio_num"))
      },
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'small' END AS bucket,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_x,
        CASE WHEN o_orderkey % 3 = 0 THEN NULL
             ELSE o_totalprice / (o_orderkey % 3) END AS risky_div,
        TRY_CAST(CASE WHEN o_orderkey % 1000 = 0 THEN o_orderpriority
                 ELSE SUBSTRING(o_orderpriority, 1, 1) END AS INT) AS prio_num
        FROM orders""")),

    // ------------------------------------------------------------------
    QueryEntry("f09_hash_encode",
      (s, d) => {
        Tables(s, d, "nation").select(
          col("n_nationkey"),
          md5(col("n_name")).as("md5_hex"),
          sha2(col("n_name"), 256).as("sha256_hex"),
          base64(col("n_name").cast(BinaryType)).as("b64"),
          hex(col("n_name").cast(BinaryType)).as("hexed"))
      },
      Some("""SELECT n_nationkey,
        MD5(n_name) AS md5_hex,
        SHA256(n_name) AS sha256_hex,
        TO_BASE64(ENCODE(n_name)) AS b64,
        UPPER(HEX(ENCODE(n_name))) AS hexed
        FROM nation""")),

    // ------------------------------------------------------------------
    QueryEntry("f10_percentiles",
      (s, d) => {
        // ONE percentile aggregate with an array of fractions — five
        // separate percentile()/median() calls each build and sort
        // their own counts buffer over the same column (5x the
        // aggregation state; the honest-bench r8 fix surfaced it as
        // 4 s at sf0.1). Spark's Median IS Percentile(0.5), so med
        // reads the same array slot.
        Tables(s, d, "lineitem").groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))").as("ps"))
          .select(col("l_returnflag"),
            round(col("ps")(0), 4).as("p25"),
            round(col("ps")(1), 4).as("p50"),
            round(col("ps")(2), 4).as("p75"),
            round(col("ps")(3), 4).as("p95"),
            round(col("ps")(1), 4).as("med"))
      },
      Some("""SELECT l_returnflag,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS p75,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95,
        ROUND(MEDIAN(l_extendedprice), 4) AS med
        FROM lineitem GROUP BY l_returnflag""")),

    // ------------------------------------------------------------------
    // Approximate sketches differ across engines by design -> rows-only.
    QueryEntry("f11_approx_aggs",
      (s, d) => {
        Tables(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_med"))
      },
      None),

    // ------------------------------------------------------------------
    // Trino approx_most_frequent via our Space-Saving
    // TypedImperativeAggregate. 5 distinct priorities << capacity, so
    // the sketch is exact here and the oracle can be plain SQL top-k;
    // FunctionsSpec covers the bounded-memory eviction path.
    QueryEntry("f13_approx_most_frequent",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(expr("approx_most_frequent(3, o_orderpriority)").as("amf"))
          .selectExpr("o_orderstatus", "posexplode(amf) AS (rk0, e)")
          .selectExpr("o_orderstatus", "CAST(rk0 + 1 AS BIGINT) AS rk",
            "e.value AS priority", "e.cnt AS cnt")
      },
      Some("""WITH c AS (SELECT o_orderstatus, o_orderpriority AS priority, COUNT(*) AS cnt
          FROM orders GROUP BY 1, 2),
        r AS (SELECT o_orderstatus, priority, cnt,
            ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY cnt DESC, priority) AS rk
          FROM c)
        SELECT o_orderstatus, rk, priority, cnt FROM r WHERE rk <= 3""")),

    // ------------------------------------------------------------------
    // Map-type family (SURVEY §2.4 Map row): map construction, map_keys,
    // map_values, element_at, map_entries, map_concat, map_filter,
    // transform_values, map_contains_key. The oracle computes the same
    // scalars directly from the base columns (DuckDB's MAP surface
    // differs across versions); the Spark side is the real map pipeline.
    QueryEntry("f14_map_funcs",
      (s, d) => {
        val m = map(lit("size"), col("p_size"),
                    lit("clen"), length(col("p_type")))
        Tables(s, d, "part").select(col("p_partkey"), m.as("m")).select(
          col("p_partkey"),
          array_join(map_keys(col("m")), ",").as("keys_csv"),
          aggregate(map_values(col("m")), lit(0), (acc, x) => acc + x).as("vals_sum"),
          element_at(col("m"), "size").as("sz"),
          size(map_concat(col("m"), map(lit("extra"), lit(1)))).as("n_concat"),
          size(map_filter(col("m"), (_, v) => v > 10)).as("n_big"),
          element_at(transform_values(col("m"), (_, v) => v * 2), "size").as("dbl_sz"),
          map_contains_key(col("m"), "clen").as("has_clen"),
          array_join(transform(map_entries(col("m")),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast(StringType))), ",").as("entries_str"))
      },
      Some("""SELECT p_partkey,
        'size,clen' AS keys_csv,
        CAST(p_size + LENGTH(p_type) AS INT) AS vals_sum,
        p_size AS sz,
        CAST(3 AS INT) AS n_concat,
        CAST(CASE WHEN p_size > 10 THEN 1 ELSE 0 END
           + CASE WHEN LENGTH(p_type) > 10 THEN 1 ELSE 0 END AS INT) AS n_big,
        CAST(p_size * 2 AS INT) AS dbl_sz,
        TRUE AS has_clen,
        'size=' || CAST(p_size AS VARCHAR) || ',clen=' ||
          CAST(LENGTH(p_type) AS VARCHAR) AS entries_str
        FROM part""")),

    // ------------------------------------------------------------------
    // Bitwise family (Trino bitwise_and/or/xor/left_shift/right_shift/
    // bit_count surface): operators + functions over BIGINT, identical
    // two's-complement semantics in both engines.
    QueryEntry("f15_bitwise",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
            col("l_partkey"))
        li.selectExpr("l_orderkey", "ln",
            "l_partkey & 255 AS band",
            "ln | 8 AS orr",
            "CAST(l_partkey ^ ln AS BIGINT) AS xorv",
            "shiftleft(ln, 3) AS shl",
            "shiftright(l_partkey, 2) AS shr",
            "bit_count(l_partkey) AS nbits",
            "~ln AS notv")
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"),
            sum(col("orr")).as("sum_orr"),
            sum(col("xorv")).as("sum_xor"),
            sum(col("shl")).as("sum_shl"),
            sum(col("shr")).as("sum_shr"),
            sum(col("nbits")).as("sum_bits"),
            sum(col("notv")).as("sum_not"))
      },
      Some("""WITH b AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln, l_partkey
          FROM lineitem)
        SELECT l_partkey & 255 AS band, COUNT(*) AS n,
          CAST(SUM(ln | 8) AS BIGINT) AS sum_orr,
          CAST(SUM(xor(l_partkey, ln)) AS BIGINT) AS sum_xor,
          CAST(SUM(ln << 3) AS BIGINT) AS sum_shl,
          CAST(SUM(l_partkey >> 2) AS BIGINT) AS sum_shr,
          CAST(SUM(bit_count(l_partkey)) AS BIGINT) AS sum_bits,
          CAST(SUM(~ln) AS BIGINT) AS sum_not
        FROM b GROUP BY 1""")),

    // ------------------------------------------------------------------
    // Array set operations (union/intersect/except + slice/flatten/
    // position). Set-op outputs are order-unspecified across engines,
    // so both sides sort before comparison. Array columns are serialized
    // through array_join/ARRAY_TO_STRING so the driver's pandas-based
    // row sort can hash them (raw numpy arrays are unhashable there);
    // the set-op logic itself is unchanged.
    QueryEntry("f16_array_setops",
      (s, d) => {
        Tables(s, d, "part")
          .selectExpr("p_partkey",
            "sequence(CAST(1 AS BIGINT), CAST(p_size % 6 + 2 AS BIGINT)) AS a",
            "sequence(CAST(p_size % 4 + 1 AS BIGINT), CAST(p_size % 4 + 4 AS BIGINT)) AS b")
          .selectExpr("p_partkey",
            "array_join(sort_array(array_union(a, b)), ',') AS u",
            "array_join(sort_array(array_intersect(a, b)), ',') AS itr",
            "array_join(sort_array(array_except(a, b)), ',') AS exc",
            "array_join(slice(a, 2, 3), ',') AS sl",
            "array_join(flatten(array(a, b)), ',') AS fl",
            "array_position(b, 2) AS pos")
      },
      Some("""WITH x AS (SELECT p_partkey,
          GENERATE_SERIES(1, p_size % 6 + 2) AS a,
          GENERATE_SERIES(p_size % 4 + 1, p_size % 4 + 4) AS b
        FROM part)
        SELECT p_partkey,
          -- COALESCE: DuckDB ARRAY_TO_STRING([]) is NULL, Spark array_join([]) is ''
          COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_CONCAT(a, b))), ','), '') AS u,
          COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_FILTER(a, v -> LIST_CONTAINS(b, v)))), ','), '') AS itr,
          COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_FILTER(a, v -> NOT LIST_CONTAINS(b, v)))), ','), '') AS exc,
          COALESCE(ARRAY_TO_STRING(a[2:4], ','), '') AS sl,
          COALESCE(ARRAY_TO_STRING(FLATTEN([a, b]), ','), '') AS fl,
          CAST(COALESCE(LIST_POSITION(b, 2), 0) AS BIGINT) AS pos
        FROM x""")),

    // ------------------------------------------------------------------
    // Custom Generator/UDTF (SURVEY §2.6 table-function row): the
    // graft-native `ngrams` generator exercised through LATERAL VIEW —
    // row expansion is narrow (no shuffle); the one shuffle is the
    // doc_id aggregation above it.
    QueryEntry("f17_ngram_explode",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "documents").createOrReplaceTempView("f17_docs")
        s.sql("""
          SELECT doc_id, COUNT(*) AS n_grams,
                 COUNT(DISTINCT ngram) AS n_distinct,
                 MIN(ngram) AS first_gram,
                 SUM(pos) AS sum_pos
          FROM f17_docs
          LATERAL VIEW ngrams(split(lower(text), ' '), 3) g AS pos, ngram
          GROUP BY doc_id""")
      },
      Some("""WITH w AS (SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS ws
          FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos, ARRAY_TO_STRING(ws[i:i+2], ' ') AS ngram
          FROM w, UNNEST(RANGE(1, LEN(ws) - 1)) AS t(i))
        SELECT doc_id, COUNT(*) AS n_grams,
          COUNT(DISTINCT ngram) AS n_distinct,
          MIN(ngram) AS first_gram,
          CAST(SUM(pos) AS BIGINT) AS sum_pos
        FROM g GROUP BY doc_id""")),

    // ------------------------------------------------------------------
    // URL function family (Trino url_extract_*): synthesize a
    // deterministic URL per part, extract every component through the
    // registered parity functions (java URI semantics Spark-side,
    // regexes in the oracle — identical on well-formed URLs).
    QueryEntry("f18_url_funcs",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "part")
          .selectExpr("p_partkey",
            """concat('https://brand-', lower(replace(p_brand, '#', '')),
                 '.example.com/parts/', p_partkey,
                 '?size=', p_size, '&pg=', p_partkey % 7, '#spec') AS url""")
          .selectExpr("p_partkey", "url",
            "url_extract_protocol(url) AS proto",
            "url_extract_host(url) AS host",
            "url_extract_path(url) AS path",
            "url_extract_query(url) AS query",
            "url_extract_parameter(url, 'size') AS p_size_s",
            "url_extract_parameter(url, 'pg') AS pg",
            "url_extract_fragment(url) AS frag")
      },
      Some("""WITH u AS (SELECT p_partkey,
          'https://brand-' || LOWER(REPLACE(p_brand, '#', '')) ||
            '.example.com/parts/' || CAST(p_partkey AS VARCHAR) ||
            '?size=' || CAST(p_size AS VARCHAR) ||
            '&pg=' || CAST(p_partkey % 7 AS VARCHAR) || '#spec' AS url
          FROM part)
        SELECT p_partkey, url,
          REGEXP_EXTRACT(url, '^([a-z]+)://', 1) AS proto,
          REGEXP_EXTRACT(url, '^[a-z]+://([^/?#]+)', 1) AS host,
          REGEXP_EXTRACT(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
          REGEXP_EXTRACT(url, '\?([^#]*)', 1) AS query,
          REGEXP_EXTRACT(url, '[?&]size=([^&#]*)', 1) AS p_size_s,
          REGEXP_EXTRACT(url, '[?&]pg=([^&#]*)', 1) AS pg,
          REGEXP_EXTRACT(url, '#(.*)$', 1) AS frag
        FROM u""")),

    // ------------------------------------------------------------------
    // (f12 retired in r5: xxhash64/murmur/crc32 values are not DuckDB-
    // expressible, so the entry could only ever be a gray rows-only
    // check. The kernels are verified in FunctionsSpec instead — crc32
    // against java.util.zip.CRC32, a genuinely independent oracle, and
    // xxhash64/murmur for cross-plan determinism; md5/sha256 stay
    // DuckDB-checked in f09.)

    // ------------------------------------------------------------------
    // MERGEABLE sketch columns (Spark 4 Datasketches HLL): per-group
    // sketches built once, unioned at query time — the pre-aggregated
    // sketch-table pattern that replaces COUNT(DISTINCT) rescans at
    // 100 TB (store sketches in a rollup table; any slice unions in
    // O(groups), never re-reading the fact data). Sketch bytes are
    // engine-specific -> rows-only; FunctionsSpec pins the error
    // envelope and the union-vs-direct consistency property.
    // Exact-below-saturation device, HLL edition (r12 verdict #7,
    // probed round 13 — Probe14 `hllexact`): DataSketches HLL starts
    // in exact coupon LIST/SET modes and at lgK=21 stays EXACT through
    // every probed rung up to 16k distinct (64k is past the SET->HLL
    // promotion: 64003), including through hll_union_agg of the
    // per-group sketches — so this entry carries a FULL DuckDB oracle
    // like f20/f22/f23 (orders.o_custkey: ~1k distinct at the sf0.01
    // gate, ~10k at sf0.1 — both inside the exact regime).
    // SF CEILING (r13 advice, pinned): the oracle equality is only
    // valid while the distinct count stays in the lgK=21 exact coupon
    // regime — probed exact at 16k, inexact by 64k — so running the
    // correctness gate at sf1 (~100k distinct customers) would make
    // this entry fail against its own oracle. That failure mode is
    // THIS note, not a regression; if the gate SF ever rises past
    // sf0.1, re-derive the rung (Probe14 hllexact) or demote f19 to
    // the envelope check. The
    // saturated estimator regime stays FunctionsSpec's envelope (the
    // default-lgK path asserted there). Spark-native
    // approx_count_distinct has NO exact regime (dense-only HLL++,
    // probed biased at every rung down to n=100) — f11 stays
    // envelope-only by nature.
    QueryEntry("f19_hll_sketch_columns",
      (s, d) => {
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(expr("hll_sketch_agg(o_custkey, 21)").as("sk"), count(lit(1)).as("n"))
          .agg(
            expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)")
              .as("merged_distinct"),
            sum(col("n")).as("n_rows"),
            count(lit(1)).as("n_groups"))
      },
      Some("""SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS merged_distinct,
          COUNT(*) AS n_rows,
          COUNT(DISTINCT o_orderstatus) AS n_groups
        FROM orders""")),

    // ------------------------------------------------------------------
    // KMV bottom-k distinct sketches (round 11, functions/KmvSketch
    // .scala): corpus-overlap questions with NO join — distinct
    // customers in the early/late order halves, their overlap, union
    // (pairwise-scalar path), and the per-status rollup (kmv_union_agg
    // over stored sketch rows). TWO scans of orders total, k·8-byte
    // state. Unlike the HLL rows (f11/f19, envelope-only), this IS
    // oracle-checkable: at sf0.01 each side holds < k = 8192 distinct
    // hashes, and an unsaturated KMV sketch has seen every value, so
    // estimates are returned as exact integer counts (the saturated
    // 1/√k regime is envelope-spec'd in KmvSpec). Every compared
    // column is an integer-valued double — ROUND+CAST is exact; the
    // jaccard RATIO stays out of the oracle (cross-engine float op
    // order could flip a floor boundary) and is asserted in KmvSpec.
    QueryEntry("f20_kmv_overlap",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val o = Tables(s, d, "orders")
        val halves = o.agg(
          expr("kmv_sketch(CASE WHEN o_orderdate < DATE '1995-01-01' " +
            "THEN o_custkey END, 8192)").as("s1"),
          expr("kmv_sketch(CASE WHEN o_orderdate >= DATE '1995-01-01' " +
            "THEN o_custkey END, 8192)").as("s2"))
        val rollup = o.groupBy(col("o_orderstatus"))
          .agg(expr("kmv_sketch(o_custkey, 8192)").as("sk"))
          .agg(expr("kmv_union_agg(sk)").as("u"))
        halves.crossJoin(rollup).selectExpr( // 1 row x 1 row
          "CAST(ROUND(kmv_distinct_est(s1)) AS BIGINT) AS d_early",
          "CAST(ROUND(kmv_distinct_est(s2)) AS BIGINT) AS d_late",
          "CAST(ROUND(kmv_intersect_est(s1, s2)) AS BIGINT) AS d_overlap",
          "CAST(ROUND(kmv_distinct_est(kmv_union(s1, s2))) AS BIGINT) AS d_union",
          "CAST(ROUND(kmv_distinct_est(u)) AS BIGINT) AS d_rollup")
      },
      Some("""SELECT
          (SELECT COUNT(DISTINCT o_custkey) FROM orders
             WHERE o_orderdate < DATE '1995-01-01') AS d_early,
          (SELECT COUNT(DISTINCT o_custkey) FROM orders
             WHERE o_orderdate >= DATE '1995-01-01') AS d_late,
          (SELECT COUNT(*) FROM
            (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < DATE '1995-01-01'
             INTERSECT
             SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= DATE '1995-01-01') t)
            AS d_overlap,
          (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS d_union,
          (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS d_rollup""")),

    // ------------------------------------------------------------------
    // String-similarity family (round 11): Trino 468 ships
    // levenshtein_distance and hamming_distance as scalar functions
    // [pinned docker/devserver/Dockerfile:14]. levenshtein is a Spark
    // built-in; hamming and char-set jaccard are COMPOSED from codegen'd
    // higher-order functions (zip_with + aggregate, array_intersect /
    // array_union over distinct char arrays) — no UDF, stays inside
    // whole-stage codegen, per-row cost O(len) / O(len log len). The
    // oracle's hamming/jaccard are DuckDB natives, a genuinely
    // independent implementation of the same definitions (hamming needs
    // equal lengths — the fixture's p_brand is 7 OR 8 chars, so both
    // sides hamming over left(p_brand, 7), always length 7; jaccard is
    // case-sensitive distinct-char-set ratio). translate/repeat/left/
    // right round out the Trino string surface not exercised by f02.
    // Round-12 fix: the original entry referenced p_mfgr/p_container,
    // which the part fixture does not carry (FIXTURES.md lists only
    // p_partkey/p_name/p_brand/p_type/p_size/p_retailprice); the
    // operands now ride p_brand/p_type, which exercise the same
    // functions. Verified against the DuckDB oracle at sf0.01 this
    // round (rows+schema+hash green in CORRECTNESS_r12).
    QueryEntry("f21_similarity_funcs",
      (s, d) => {
        Tables(s, d, "part").filter(col("p_partkey") <= 2000).select(
          col("p_partkey"),
          levenshtein(col("p_brand"), lit("Brand#00")).as("lev_brand"),
          expr("""aggregate(
                    zip_with(split(left(p_brand, 7), ''), split('Brand#0', ''),
                             (x, y) -> IF(x = y, 0, 1)),
                    0, (acc, v) -> acc + v)""").as("ham_brand"),
          expr("""ROUND(
                    CAST(size(array_intersect(array_distinct(split(p_name, '')),
                                              array_distinct(split(p_type, '')))) AS DOUBLE)
                    / size(array_union(array_distinct(split(p_name, '')),
                                       array_distinct(split(p_type, '')))), 6)""")
            .as("jac_name_type"),
          translate(col("p_brand"), "#", "-").as("brand_dashed"),
          expr("repeat(p_brand, 2)").as("brand_twice"),
          expr("left(p_name, 5)").as("name_l5"),
          expr("right(p_type, 3)").as("type_r3"))
      },
      Some("""SELECT p_partkey,
        LEVENSHTEIN(p_brand, 'Brand#00') AS lev_brand,
        HAMMING(LEFT(p_brand, 7), 'Brand#0') AS ham_brand,
        ROUND(JACCARD(p_name, p_type), 6) AS jac_name_type,
        TRANSLATE(p_brand, '#', '-') AS brand_dashed,
        REPEAT(p_brand, 2) AS brand_twice,
        LEFT(p_name, 5) AS name_l5,
        RIGHT(p_type, 3) AS type_r3
        FROM part WHERE p_partkey <= 2000""")),

    // ------------------------------------------------------------------
    // q-digest mergeable percentile sketches (round 12, functions/
    // QDigest.scala — Trino's qdigest type, SURVEY §1.2): per-shard
    // digests built ONCE (here sharded by (returnflag, linestatus)),
    // rolled up per returnflag with qdigest_merge_agg — percentiles
    // WITHOUT re-sorting or rescanning the shards, which f10's
    // percentile recompute cannot avoid at 100 TB. Oracle-checkable by
    // the same exactness contract as f20: below n < k the fold
    // threshold ⌊n/k⌋ is 0, nothing compresses, and qdigest_quantile
    // returns the EXACT value at sorted position ⌈q·n⌉ — which the
    // DuckDB oracle spells directly as a ROW_NUMBER window (no reliance
    // on either engine's native quantile tie-breaking). rank_of is the
    // exact fraction ≤ x in this regime (integer-valued double sums;
    // division is the same IEEE op both sides). The saturated regime's
    // ≤ 32·n/k rank-error envelope is QdigestSpec's job. k = 65536:
    // the sf0.01 gate's largest merged group holds ~30k rows (exact,
    // 2x headroom), while sf0.1+ saturates — the bench exercises the
    // BOUNDED regime a 100 TB deployment actually runs (an exact-regime
    // k would make digest size track distinct values, and the
    // second-level merge + finalizers were paying ~3s for it).
    QueryEntry("f22_qdigest_percentiles",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "lineitem")
          .selectExpr("l_returnflag", "l_linestatus",
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(expr("qdigest_agg(cents, 65536)").as("sk"))
          .groupBy(col("l_returnflag"))
          .agg(expr("qdigest_merge_agg(sk)").as("d"))
          .selectExpr(
            "l_returnflag",
            "qdigest_quantile(d, 0.5) AS p50_cents",
            "qdigest_quantile(d, 0.9) AS p90_cents",
            "qdigest_quantile(d, 0.99) AS p99_cents",
            "ROUND(qdigest_rank_of(d, 5000000), 6) AS frac_le_50k",
            "qdigest_count(d) AS n_rows")
      },
      Some("""WITH vals AS (
          SELECT l_returnflag AS rf,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
          FROM lineitem
        ), ranked AS (
          SELECT rf, v,
                 ROW_NUMBER() OVER (PARTITION BY rf ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY rf) AS n
          FROM vals
        )
        SELECT rf AS l_returnflag,
               MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN v END) AS p50_cents,
               MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN v END) AS p90_cents,
               MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN v END) AS p99_cents,
               ROUND(SUM(CASE WHEN v <= 5000000 THEN 1 ELSE 0 END)
                     / CAST(MAX(n) AS DOUBLE), 6) AS frac_le_50k,
               MAX(n) AS n_rows
        FROM ranked GROUP BY rf""")),

    // ------------------------------------------------------------------
    // Trino setdigest family (SetDigest.scala): customer-retention
    // overlap between the 1995 and 1996 order cohorts with NO self-join
    // — one scan builds per-(year, priority) digests, merge_set_digest
    // rolls them up per year, and cardinality / intersection / jaccard
    // read off the two digests in O(k). k = 8192: the sf0.01 gate's
    // year cohorts (~700 distinct custkeys, union < 2k) stay in the
    // exact regime — cardinalities and the count sum are exact
    // integers, jaccard is the same two-small-ints IEEE division DuckDB
    // computes — while sf0.1+ (15k+ customers) saturates, exercising
    // the estimator the 100 TB deployment runs (envelopes in
    // SetDigestSpec). orders_1995 demonstrates hash_counts: the sum of
    // multiplicities is the exact 1995 row count while unsaturated.
    QueryEntry("f23_setdigest_overlap",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "orders")
          .selectExpr("year(o_orderdate) AS y", "o_orderpriority AS pri",
            "o_custkey AS ck")
          .filter(col("y").isin(1995, 1996))
          .groupBy(col("y"), col("pri"))
          .agg(expr("make_set_digest(ck, 8192)").as("sk"))
          .groupBy(col("y"))
          .agg(expr("merge_set_digest(sk)").as("sk"))
          .agg(
            expr("min_by(sk, y)").as("a"), // 1995
            expr("max_by(sk, y)").as("b")) // 1996
          .selectExpr(
            "set_digest_cardinality(a) AS custs_1995",
            "set_digest_cardinality(b) AS custs_1996",
            "intersection_cardinality(a, b) AS retained",
            "ROUND(jaccard_index(a, b), 6) AS jacc",
            "aggregate(map_values(hash_counts(a)), 0L, (acc, c) -> acc + c) AS orders_1995")
      },
      Some("""WITH o AS (
          SELECT year(o_orderdate) AS y, o_custkey AS ck FROM orders
          WHERE year(o_orderdate) IN (1995, 1996)
        ), a AS (SELECT DISTINCT ck FROM o WHERE y = 1995),
           b AS (SELECT DISTINCT ck FROM o WHERE y = 1996)
        SELECT (SELECT COUNT(*) FROM a) AS custs_1995,
               (SELECT COUNT(*) FROM b) AS custs_1996,
               (SELECT COUNT(*) FROM a JOIN b USING (ck)) AS retained,
               ROUND((SELECT COUNT(*) FROM a JOIN b USING (ck)) * 1.0 /
                     (SELECT COUNT(*) FROM (SELECT ck FROM a UNION SELECT ck FROM b)),
                     6) AS jacc,
               (SELECT COUNT(*) FROM o WHERE y = 1995) AS orders_1995""")),

    // ------------------------------------------------------------------
    // Trino aggregate parity (MapAggs.scala + rewrites): histogram /
    // map_union / multimap_agg (exact map-building aggregates Spark
    // lacks), geometric_mean = exp(avg(ln)), arbitrary -> First(ignore
    // nulls), bitwise_and_agg/bitwise_or_agg -> bit_and/bit_or, and
    // Spark 4's native listagg ... WITHIN GROUP. The maps are reduced
    // to scalars here (counts, lookups, value sums) because the oracle
    // compares canonicalized VALUES and map key order is engine-
    // arbitrary in both systems; the maps themselves are asserted
    // entry-for-entry in MapAggsSpec. map_union's duplicate-key pick
    // is made deterministic the only way Trino's contract allows:
    // values that are a function of the key (length(p_type)), so any
    // winner agrees. arbitrary() is deterministic within a group here
    // because its argument is constant per group key. checksum() is
    // spec-only (its hash kernel is engine-defined, same as Trino's).
    QueryEntry("f24_trino_agg_parity",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "part")
          .groupBy(col("p_brand"))
          .agg(
            expr("cardinality(histogram(p_type))").as("n_types"),
            expr("element_at(histogram(p_type), 'STANDARD ANODIZED TIN')").as("cnt_sat"),
            expr("array_max(map_values(histogram(p_type)))").as("top_type_cnt"),
            expr("aggregate(map_values(map_union(map(p_type, length(p_type)))), 0, (acc, x) -> acc + x)").as("sum_type_len"),
            expr("size(element_at(multimap_agg(p_size, p_partkey), 7))").as("n_size7"),
            expr("ROUND(geometric_mean(p_retailprice), 4)").as("gm_price"),
            expr("arbitrary(upper(p_brand))").as("brand_up"),
            expr("bitwise_and_agg(p_size)").as("size_and"),
            expr("bitwise_or_agg(p_size)").as("size_or"),
            expr("listagg(left(p_type, 1), '') WITHIN GROUP (ORDER BY left(p_type, 1))").as("type_initials"))
      },
      Some("""SELECT p_brand,
          COUNT(DISTINCT p_type) AS n_types,
          NULLIF(COUNT(*) FILTER (WHERE p_type = 'STANDARD ANODIZED TIN'), 0) AS cnt_sat,
          (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM part i
            WHERE i.p_brand = o.p_brand GROUP BY i.p_type)) AS top_type_cnt,
          (SELECT CAST(SUM(LENGTH(t)) AS INT) FROM
            (SELECT DISTINCT p_type AS t FROM part i WHERE i.p_brand = o.p_brand)) AS sum_type_len,
          NULLIF(COUNT(*) FILTER (WHERE p_size = 7), 0) AS n_size7,
          ROUND(EXP(AVG(LN(p_retailprice))), 4) AS gm_price,
          UPPER(p_brand) AS brand_up,
          BIT_AND(p_size) AS size_and,
          BIT_OR(p_size) AS size_or,
          STRING_AGG(LEFT(p_type, 1), '' ORDER BY LEFT(p_type, 1)) AS type_initials
        FROM part o GROUP BY p_brand""")),

    // ------------------------------------------------------------------
    // Trino numeric_histogram (NumericHistogram.scala, Ben-Haim/Tom-Tov
    // JMLR 2010): per-returnflag quantity distribution. l_quantity has
    // 50 distinct integer values, buckets = 64 > 50, so NO centroid
    // merge ever fires — the histogram is the exact (value, count) map
    // at EVERY scale factor and the oracle derives the same arrays from
    // plain SQL; the saturated regime (merges firing) is
    // NumericHistogramSpec's job: exact total count, weighted-sum
    // preservation, strictly-increasing centroids, merge-vs-rescan
    // equality. Map key order is ascending by construction (the buffer
    // is a sorted array), which map_keys/map_values expose directly.
    QueryEntry("f25_numeric_histogram",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "lineitem")
          .selectExpr("l_returnflag", "CAST(l_quantity AS DOUBLE) AS q")
          .groupBy(col("l_returnflag"))
          .agg(expr("numeric_histogram(64, q)").as("nh"))
          .selectExpr(
            "l_returnflag",
            "size(map_keys(nh)) AS n_centroids",
            // f16 house style: the driver's pandas harness cannot sort
            // array cells, so every array output is array_join'ed to a
            // canonical string. Quantities/counts are exactly integral
            // below saturation, so BIGINT is a lossless encoding.
            "array_join(transform(map_keys(nh), x -> CAST(x AS BIGINT)), ',') AS qty_values",
            "array_join(transform(map_values(nh), x -> CAST(x AS BIGINT)), ',') AS qty_counts",
            "aggregate(map_values(nh), 0D, (acc, x) -> acc + x) AS total_rows")
      },
      Some("""WITH g AS (
          SELECT l_returnflag AS rf, CAST(l_quantity AS DOUBLE) AS q,
                 CAST(COUNT(*) AS DOUBLE) AS c
          FROM lineitem GROUP BY 1, 2)
        SELECT rf AS l_returnflag,
               CAST(COUNT(*) AS INT) AS n_centroids,
               ARRAY_TO_STRING(LIST(CAST(q AS BIGINT) ORDER BY q), ',') AS qty_values,
               ARRAY_TO_STRING(LIST(CAST(c AS BIGINT) ORDER BY q), ',') AS qty_counts,
               SUM(c) AS total_rows
        FROM g GROUP BY rf""")),

    // ------------------------------------------------------------------
    // Trino scalar parity batch 2 (ScalarParity.scala StaticInvoke
    // kernels + date rewrites): hamming_distance / codepoint /
    // normalize / from_base / to_base, the Trino 3-arg
    // date_add(unit, n, ts), last_day_of_month, week_of_year. Every
    // kernel call sits inside whole-stage codegen (StaticInvoke, no
    // UDFs — PlanSpec-style contract kept). to_base is lowercase like
    // Trino; the oracle lowercases DuckDB's to_base to be caseblind.
    // from_base(to_base(k)) re-derives the key — the self-inverse pair
    // oracles as the key itself. Trino's date_add('unit', n, ts) is a
    // GraftSql dialect rewrite to timestampadd (Spark's parser reserves
    // the date_add(unit, ...) grammar — SqlSpec pins the rewrite);
    // this Spark-API entry spells timestampadd directly and casts the
    // timestamp fixture column back to DATE.
    QueryEntry("f26_scalar_parity2",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "orders")
          .filter(col("o_orderkey") <= 2000)
          .selectExpr(
            "o_orderkey",
            "hamming_distance(o_orderstatus, 'F') AS hd_status",
            "codepoint(o_orderstatus) AS cp_status",
            "to_base(o_orderkey, 16) AS hex_key",
            "from_base(to_base(o_orderkey, 16), 16) AS roundtrip_key",
            "normalize(o_orderpriority) AS norm_pri",
            "CAST(timestampadd(MONTH, 3, o_orderdate) AS DATE) AS due_plus3m",
            "last_day_of_month(o_orderdate) AS eom",
            "week_of_year(o_orderdate) AS woy")
      },
      Some("""SELECT o_orderkey,
          CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS hd_status,
          unicode(o_orderstatus) AS cp_status,
          LOWER(to_base(o_orderkey, 16)) AS hex_key,
          o_orderkey AS roundtrip_key,
          nfc_normalize(o_orderpriority) AS norm_pri,
          CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS due_plus3m,
          last_day(CAST(o_orderdate AS DATE)) AS eom,
          weekofyear(o_orderdate) AS woy
        FROM orders WHERE o_orderkey <= 2000""")),

    // ------------------------------------------------------------------
    // Trino scalar parity batch 3 (round 13, ScalarParity.scala batch-3
    // StaticInvoke kernels): width_bucket (ascending AND descending
    // bounds), luhn_check (the oracle re-derives the checksum with
    // DuckDB list ops over the digit string), to_big_endian_64 /
    // from_big_endian_64 (hex of the 8-byte encoding oracles as the
    // zero-padded base-16 key; the pair round-trips to the key itself),
    // and great_circle_distance (haversine, earth radius 6371.01 km —
    // the Presto/Trino MathFunctions constant; the oracle spells the
    // IDENTICAL formula term-for-term, so ROUND(4) only absorbs
    // last-ulp libm differences). Lat/lon operands are synthesized from
    // the keys, away from poles/antipodes.
    QueryEntry("f28_scalar_parity3",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "orders")
          .filter(col("o_orderkey") <= 3000)
          .selectExpr(
            "o_orderkey",
            "width_bucket(o_totalprice, 0, 600000, 10) AS price_bucket",
            "width_bucket(o_totalprice, 600000, 0, 10) AS price_bucket_desc",
            "luhn_check(CAST(o_orderkey AS STRING)) AS luhn_ok",
            "hex(to_big_endian_64(o_orderkey)) AS be_hex",
            "from_big_endian_64(to_big_endian_64(o_orderkey)) AS be_roundtrip",
            "ROUND(great_circle_distance(" +
              "CAST(o_orderkey % 120 AS DOUBLE) - 60 + 0.25, " +
              "CAST(o_custkey % 300 AS DOUBLE) - 150 + 0.5, " +
              "CAST(o_custkey % 120 AS DOUBLE) - 60 - 0.25, " +
              "CAST(o_orderkey % 300 AS DOUBLE) - 150 - 0.5), 4) AS gc_km")
      },
      Some("""WITH b AS (
          SELECT o_orderkey, o_totalprice, CAST(o_orderkey AS VARCHAR) AS s,
                 CAST(o_orderkey % 120 AS DOUBLE) - 60 + 0.25 AS lat1,
                 CAST(o_custkey % 300 AS DOUBLE) - 150 + 0.5 AS lon1,
                 CAST(o_custkey % 120 AS DOUBLE) - 60 - 0.25 AS lat2,
                 CAST(o_orderkey % 300 AS DOUBLE) - 150 - 0.5 AS lon2
          FROM orders WHERE o_orderkey <= 3000)
        SELECT o_orderkey,
          CASE WHEN o_totalprice < 0 THEN 0
               WHEN o_totalprice >= 600000 THEN 11
               ELSE CAST(FLOOR(o_totalprice / 600000 * 10) AS BIGINT) + 1 END AS price_bucket,
          CASE WHEN o_totalprice > 600000 THEN 0
               WHEN o_totalprice <= 0 THEN 11
               ELSE CAST(FLOOR((600000 - o_totalprice) / 600000 * 10) AS BIGINT) + 1 END
            AS price_bucket_desc,
          (list_sum(list_transform(range(1, LEN(s) + 1), i ->
             CASE WHEN (LEN(s) - i) % 2 = 1
                  THEN CASE WHEN CAST(s[i] AS INT) * 2 > 9
                            THEN CAST(s[i] AS INT) * 2 - 9
                            ELSE CAST(s[i] AS INT) * 2 END
                  ELSE CAST(s[i] AS INT) END)) % 10 = 0) AS luhn_ok,
          LPAD(to_base(o_orderkey, 16), 16, '0') AS be_hex,
          o_orderkey AS be_roundtrip,
          ROUND(2 * 6371.01 * ASIN(SQRT(
            SIN(RADIANS(lat2 - lat1) / 2) * SIN(RADIANS(lat2 - lat1) / 2) +
            COS(RADIANS(lat1)) * COS(RADIANS(lat2)) *
              SIN(RADIANS(lon2 - lon1) / 2) * SIN(RADIANS(lon2 - lon1) / 2))), 4) AS gc_km
        FROM b""")),

    // ------------------------------------------------------------------
    // Trino cosine_similarity(map, map) (round 13, ScalarParity.scala
    // kernel): SPARSE-vector cosine over per-source word-count maps —
    // the tf-idf-style corpus comparison without a dense vocabulary.
    // Tokenization is the shared single-space split (empties dropped),
    // counts are integral so dot/norms are EXACT in doubles regardless
    // of accumulation order, and the oracle re-derives the same value
    // relationally (self-join on word); ROUND(6) absorbs nothing but
    // division/sqrt last-ulp. Scale shape: per-source maps are
    // vocabulary-sized state; pair count is sources², a metadata-sized
    // relation.
    QueryEntry("f29_cosine_similarity",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val words = Tables(s, d, "documents")
          .selectExpr("source", "explode(split(lower(text), ' ')) AS w")
          .filter(col("w") =!= "")
          .groupBy(col("source"), col("w")).count()
        val vecs = words.groupBy(col("source"))
          .agg(expr("map_from_entries(collect_list(struct(w, CAST(count AS DOUBLE))))")
            .as("m"))
        vecs.select(col("source").as("source_a"), col("m").as("ma"))
          .crossJoin(vecs.select(col("source").as("source_b"), col("m").as("mb")))
          .filter(col("source_a") < col("source_b"))
          .selectExpr("source_a", "source_b",
            "ROUND(cosine_similarity(ma, mb), 6) AS cos_sim")
      },
      Some("""WITH w AS (
          SELECT source, word, CAST(COUNT(*) AS DOUBLE) AS c FROM (
            SELECT source, unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
          WHERE word <> '' GROUP BY source, word),
        n AS (SELECT source, SUM(c * c) AS n2 FROM w GROUP BY source),
        -- pairs come from the SOURCE cross product, not the shared-word
        -- join: two sources with disjoint vocabularies must still emit
        -- a row with cos 0 (the Spark side cross-joins all pairs —
        -- r13 review finding)
        p AS (SELECT a.source AS source_a, b.source AS source_b
              FROM n a JOIN n b ON a.source < b.source),
        d AS (SELECT a.source AS source_a, b.source AS source_b,
                SUM(a.c * b.c) AS dot
              FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
              GROUP BY 1, 2)
        SELECT p.source_a, p.source_b,
          ROUND(COALESCE(d.dot, 0) / (SQRT(na.n2) * SQRT(nb.n2)), 6) AS cos_sim
        FROM p
        LEFT JOIN d ON d.source_a = p.source_a AND d.source_b = p.source_b
        JOIN n na ON na.source = p.source_a
        JOIN n nb ON nb.source = p.source_b""")),

    // ------------------------------------------------------------------
    // Trino tdigest family (TDigest.scala) + the POLYMORPHIC merge()
    // aggregate: per-(returnflag, linestatus) discount digests rolled
    // up per returnflag by merge() — the same store-shards /
    // merge-at-query-time pattern as f20/f22/f23, now for DOUBLES.
    // l_discount has 11 distinct values (0.00..0.10), far under
    // compression = 100, so every centroid stays PURE (one value,
    // exact multiplicity) at EVERY scale factor: value_at_quantile is
    // the exact discrete quantile (the oracle spells it as a
    // ROW_NUMBER window, f22's device) and trimmed_mean is the exact
    // rank-window mean (ranks r with 0.25·W < r ≤ 0.75·W — the oracle
    // filters the same integer window; ROUND(6) absorbs the
    // 11-term-weighted vs 600k-term float sum-order difference).
    QueryEntry("f27_tdigest_discounts",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"), col("l_discount"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(expr("tdigest_agg(l_discount)").as("td"))
          .groupBy(col("l_returnflag"))
          .agg(expr("merge(td)").as("td"))
          .selectExpr(
            "l_returnflag",
            "value_at_quantile(td, 0.5) AS p50_disc",
            "value_at_quantile(td, 0.9) AS p90_disc",
            // f16 house style: array outputs stringified. Discounts are
            // exact multiples of 0.01, so ROUND(x*100) AS BIGINT is a
            // lossless canonical encoding (no float-format divergence).
            "array_join(transform(values_at_quantiles(td, array(0.1D, 0.99D)), x -> CAST(ROUND(x * 100) AS BIGINT)), ',') AS p10_p99",
            "ROUND(trimmed_mean(td, 0.25, 0.75), 6) AS iqr_mean")
      },
      Some("""WITH ranked AS (
          SELECT l_returnflag AS rf, l_discount AS v,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_discount) AS rn,
                 COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem)
        SELECT rf AS l_returnflag,
               MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN v END) AS p50_disc,
               MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN v END) AS p90_disc,
               ARRAY_TO_STRING([
                 CAST(ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.1 * n) AS BIGINT) THEN v END) * 100) AS BIGINT),
                 CAST(ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN v END) * 100) AS BIGINT)], ',') AS p10_p99,
               ROUND(AVG(v) FILTER (WHERE rn > 0.25 * n AND rn <= FLOOR(0.75 * n)), 6) AS iqr_mean
        FROM ranked GROUP BY rf"""))
  )
}
