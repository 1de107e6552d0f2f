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
    * must be INTEGRAL (epoch seconds/millis, positions, ...); non-key
    * column names must be disjoint across the two sides. Intervals with
    * lo > hi match nothing (dropped by the grain sequence bound check
    * below, same as SQL BETWEEN semantics).
    *
    * Binning is exact LONG floor-division — float division would lose
    * integer precision above 2^53 (epoch-nanos territory: ulp 256) and
    * could bin a boundary point and its covering interval into
    * DIFFERENT grains, silently dropping the match. Fractional domains:
    * scale to integers first (the caller knows the resolution). */
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
    val integralTypes: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    Seq(points.schema(ptCol), intervals.schema(loCol), intervals.schema(hiCol)).foreach(f =>
      require(integralTypes(f.dataType),
        s"${f.name} must be an integral type for exact binning, got ${f.dataType.simpleString}"))

    // the bin id is the GRAIN START, x - pmod(x, g): pure long
    // arithmetic (no division at all); interval bins enumerate by
    // sequence(loStart, hiStart, g). Values within one grain of
    // Long.MinValue would WRAP in the subtraction (binning them into a
    // far-positive grain, silently unmatched) — raise instead; real
    // domains (epochs, offsets) never live at the Long floor.
    def grainStart(c: org.apache.spark.sql.Column) = {
      val x = c.cast("long")
      // NULL keeps BETWEEN semantics: a null value bins to null and the
      // equi-join drops it (never matches), exactly like SQL BETWEEN —
      // only an actual near-Long.MinValue value raises
      when(x.isNull, lit(null).cast("long"))
        .when(x >= Long.MinValue + grain, x - pmod(x, lit(grain)))
        .otherwise(raise_error(concat(
          lit(s"value within one grain ($grain) of Long.MinValue cannot bin exactly: "),
          x.cast("string"))).cast("long"))
    }
    // overflow-safe driver-side width cap for the fan-out guard
    val maxWidth =
      try math.multiplyExact(maxFanoutPerInterval, grain)
      catch { case _: ArithmeticException => Long.MaxValue }

    val p = points.withColumn("__grain", grainStart(col(ptCol)))
    val i = intervals
      // empty intervals (lo > hi) produce an empty sequence -> no rows
      .filter(col(loCol) <= col(hiCol))
      // a wild interval (hi - lo >> grain) would explode astronomically
      // and HANG the job; fail loudly instead. The guard wraps the
      // sequence's upper bound so column pruning cannot elide it.
      .withColumn("__grain",
        explode(sequence(
          grainStart(col(loCol)),
          // try_subtract: an interval wider than 2^63 must hit the
          // guard (null <= maxWidth is false-ish -> raise), not wrap
          // negative and sneak past it
          when(try_subtract(col(hiCol).cast("long"), col(loCol).cast("long")) <= maxWidth,
            grainStart(col(hiCol)))
            .otherwise(raise_error(concat(
              lit(s"interval wider than maxFanoutPerInterval=$maxFanoutPerInterval " +
                s"grains at grain $grain: ["),
              col(loCol), lit(", "), col(hiCol),
              lit("] — raise the grain or cap the interval")))
              .cast("long")),
          lit(grain))))
    p.join(i, keys :+ "__grain")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__grain")
  }
}
