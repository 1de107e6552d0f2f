package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.store.GraftTable

/** Round-12 probe: the SKETCH-COLUMN TABLE pattern measured end to end
  * — the way a 100 TB deployment actually answers "p99 price and
  * distinct suppliers over any date window" without rescanning facts.
  *
  * sketchtbl:<sfDir> —
  *   1. one scan of lineitem builds a per-SHIP-DAY stats table
  *      (qdigest of price cents, setdigest of suppliers, HLL of parts,
  *      row count) persisted as a GraftTable — ~2,400 rows at sf1;
  *   2. the WHOLE-PERIOD stats then come from merging the daily
  *      sketches (rows read = days, not facts) via the polymorphic
  *      merge();
  *   3. the same stats recomputed from the RAW fact table
  *      (percentile_approx + approx_count_distinct + count) time the
  *      path the sketch table replaces;
  *   4. a one-year window repeats both paths (the rollup-flexibility
  *      point: ANY window is a filter on the stats table).
  * Reports wall seconds per path and cross-checks the sketch answers
  * against the raw-path answers (count exact; distincts within the
  * sketch envelopes; percentiles within qdigest rank error).
  *
  * The probe-scale wall ratio UNDERSTATES the 100 TB effect: here the
  * fact scan is page-cached; on a cluster the raw path rescans the
  * fact table across the network every query, while the sketch path
  * reads O(days) rows forever.
  *
  * Usage: runMain graft.tools.Probe13 sketchtbl:/tmp/sf1
  */
object Probe13 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach {
      case s if s.startsWith("sketchtbl:") =>
        sketchtbl(spark, s.stripPrefix("sketchtbl:"))
      case other => sys.error(s"unknown probe spec: $other")
    }
    spark.stop()
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def sketchtbl(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select(to_date(col("l_shipdate")).as("day"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"),
        col("l_suppkey"), col("l_partkey"))

    // 1. build the per-day stats table (ONE scan of the facts)
    val root = java.nio.file.Files.createTempDirectory("probe13").toString + "/daily"
    val (_, buildSec) = time {
      val daily = li.groupBy(col("day")).agg(
        expr("qdigest_agg(cents, 65536)").as("price_qd"),
        expr("make_set_digest(l_suppkey, 8192)").as("supp_sd"),
        expr("approx_set(l_partkey)").as("part_hll"),
        count(lit(1)).as("n"))
      GraftTable.create(spark, root, daily)
    }
    val days = GraftTable.load(spark, root).read().count()

    // 2. whole-period stats from the sketch table (rows read = days)
    def sketchStats(filter: String): (Long, Long, Long, Long, Double) = {
      val t = GraftTable.load(spark, root).read().filter(filter)
      val (row, sec) = time {
        t.agg(
          expr("qdigest_quantile(merge(price_qd), 0.99)").as("p99"),
          expr("set_digest_cardinality(merge(supp_sd))").as("supps"),
          expr("CAST(hll_sketch_estimate(merge(part_hll)) AS BIGINT)").as("parts"),
          sum(col("n")).as("rows")).head()
      }
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), sec)
    }

    // 3. the same stats from the raw facts (rescans the fact table)
    def rawStats(filter: String): (Long, Long, Long, Long, Double) = {
      val t = li.filter(filter)
      val (row, sec) = time {
        t.agg(
          expr("percentile_approx(cents, 0.99, 10000)").as("p99"),
          expr("approx_count_distinct(l_suppkey)").as("supps"),
          expr("approx_count_distinct(l_partkey)").as("parts"),
          count(lit(1)).as("rows")).head()
      }
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), sec)
    }

    val skAll = sketchStats("true")
    val rawAll = rawStats("true")
    val skYear = sketchStats("year(day) = 1995")
    val rawYear = rawStats("year(l_shipdate) = 1995")

    def report(tag: String, sk: (Long, Long, Long, Long, Double),
        raw: (Long, Long, Long, Long, Double)): Unit = {
      require(sk._4 == raw._4, s"$tag row counts must be EXACT: ${sk._4} vs ${raw._4}")
      val p99RelErr = math.abs(sk._1 - raw._1).toDouble / raw._1
      val suppRelErr = math.abs(sk._2 - raw._2).toDouble / math.max(1, raw._2)
      println(f"""{"probe":"sketchtbl","window":"$tag","days":$days,""" +
        f""""sketch_sec":${sk._5}%.3f,"raw_sec":${raw._5}%.3f,""" +
        f""""speedup":${raw._5 / sk._5}%.1f,"rows":${sk._4},""" +
        f""""p99_relerr":$p99RelErr%.4f,"supp_relerr":$suppRelErr%.4f}""")
      require(p99RelErr < 0.05, s"$tag p99 drifted past the qdigest envelope")
      require(suppRelErr < 0.10, s"$tag supplier distinct past the setdigest envelope")
    }
    println(f"""{"probe":"sketchtbl","build_sec":$buildSec%.3f,"days":$days}""")
    report("all", skAll, rawAll)
    report("y1995", skYear, rawYear)
  }
}
