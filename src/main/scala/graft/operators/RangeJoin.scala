package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point row to every interval row
  * with the same key and `lo <= pt <= hi` (inclusive). The attribution
  * / containment join of event pipelines — and a plan-shape trap in
  * Spark: a raw `ON k = k AND pt BETWEEN lo AND hi` join degenerates
  * to a per-key loop join (the range predicate can't hash), which at
  * 100 TB is quadratic in the hottest key's row count.
  *
  * Scale path: GRAIN BINNING (the public interval-join technique used
  * by Flink's interval join and Trino/DuckDB's IEJoin alternatives).
  * Each point falls in exactly ONE time grain; each interval explodes
  * to the grains it covers (≈ len/grain + 1 rows, a bounded, explicit
  * fan-out — choose `grain` near the typical interval length so the
  * explode factor stays ~2). The join becomes a plain equi-join on
  * (keys, grain) — hash-shuffled, AQE-skew-splittable, broadcast-free —
  * followed by the exact range filter. A (point, interval) pair can
  * only meet at the point's single grain, so the output needs NO
  * dedup. Every stage is codegen'd; nothing is driver-sized.
  */
object RangeJoin {

  /** Inner range join. `points(ptCol)` and `intervals(loCol, hiCol)`
    * must be numeric (epoch seconds, positions, ...); non-key column
    * names must be disjoint across the two sides. Intervals with
    * lo > hi match nothing (dropped by the grain sequence bound check
    * below, same as SQL BETWEEN semantics). */
  def binnedIntervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                         ptCol: String, loCol: String, hiCol: String,
                         grain: Long, maxFanoutPerInterval: Long = 100000L): DataFrame = {
    require(grain > 0, s"grain must be positive, got $grain")
    require(maxFanoutPerInterval > 0, "maxFanoutPerInterval must be positive")
    require(keys.nonEmpty, "range join needs at least one equi-key (add a constant to go global)")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns collide across sides: ${overlap.mkString(",")} — rename first")
    require((points.columns ++ intervals.columns).forall(_ != "__grain"),
      "column name __grain is reserved by binnedIntervalJoin")

    val p = points.withColumn("__grain", floor(col(ptCol) / grain))
    val i = intervals
      // empty intervals (lo > hi) produce an empty sequence -> no rows
      .filter(col(loCol) <= col(hiCol))
      // a wild interval (hi - lo >> grain) would explode astronomically
      // and HANG the job; fail loudly instead. The guard wraps the
      // sequence's upper bound so column pruning cannot elide it.
      .withColumn("__grain",
        explode(sequence(
          floor(col(loCol) / grain),
          when((col(hiCol) - col(loCol)) / grain <= maxFanoutPerInterval,
            floor(col(hiCol) / grain))
            .otherwise(raise_error(concat(
              lit(s"interval wider than maxFanoutPerInterval=$maxFanoutPerInterval " +
                s"grains at grain $grain: ["),
              col(loCol), lit(", "), col(hiCol),
              lit("] — raise the grain or cap the interval")))
              .cast("long")))))
    p.join(i, keys :+ "__grain")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__grain")
  }
}
