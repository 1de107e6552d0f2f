package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the operator an event/feature pipeline
  * needs constantly (attach the latest price/feature/state at or before
  * each observation) and which Spark has no native form of (walden's
  * engine has none either; DuckDB grew `ASOF JOIN`, which is the
  * oracle for e07).
  *
  * Semantics: for every left row, attach the right row with the same
  * key and the LARGEST `rightTs <= leftTs` (inclusive — DuckDB/kdb
  * convention); unmatched left rows keep nulls (left-outer).
  *
  * Implementation is the UNION + single-window pass, not a range join:
  * tag both sides, union, then one `last(..., ignoreNulls)` window per
  * carried column over (keys) ordered by (ts, side) with right rows
  * sorting BEFORE left rows at equal ts (that one tiebreak is what
  * makes the join inclusive). Why this survives 100 TB:
  *
  *  - ONE shuffle total (hash on keys for the window sort) — a naive
  *    `l.key = r.key AND r.ts <= l.ts` range join is a per-key
  *    cartesian that explodes quadratically in per-key row count,
  *    and Spark would plan exactly that;
  *  - no broadcast, no driver state; skew is bounded by the hottest
  *    single key's timeline (the floor for ANY per-entity
  *    time-ordered computation);
  *  - the window is rows-between(unbounded, current) carry-forward,
  *    which Spark evaluates streaming per partition — O(1) state per
  *    carried column, never buffering a frame.
  *
  * Contract: right must be unique per (keys, rightTs) — pre-aggregate
  * if not (an ambiguous as-of match is a data bug, not a tiebreak to
  * hide). A null in a carried right column is carried PER-COLUMN
  * (ignoreNulls looks past it to the previous right row); supply
  * non-null carried columns for strict row semantics.
  */
object AsOfJoin {

  /** Left as-of join. `rightTs` and all non-key right columns are
    * carried onto each left row; their names must not collide with
    * left's. Both ts columns must be mutually comparable (same type).
    *
    * `validateUnique = true` adds one aggregation over the right side
    * that FAILS LOUDLY when (keys, rightTs) is not unique — without
    * it, a contract violation silently picks an arbitrary row of the
    * duplicates (nondeterministic across runs). Pay the check when
    * the right side's provenance is not already a grouped derivation. */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               validateUnique: Boolean = false): DataFrame = {
    if (validateUnique) {
      val dup = right.groupBy((keys :+ rightTs).map(col): _*)
        .count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"right side not unique per (${keys.mkString(",")}, $rightTs): ${dup.mkString}")
    }
    val carried = rightTs +: right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val collisions = carried.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left: ${collisions.mkString(",")} — rename before joining")
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val reserved = Set("__ts", "__side")
    require((left.columns ++ right.columns).forall(!reserved(_)),
      s"column names ${reserved.mkString("/")} are reserved by asofLeft")

    val rightTypes = carried.map(c => c -> right.schema(c).dataType).toMap
    // left side: null placeholders for every carried column
    val lTagged = carried.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))
    )((df, c) => df.withColumn(c, lit(null).cast(rightTypes(c))))
    // right side: null placeholders for every left-only column
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val rTagged = leftOnly.foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(1))
    )((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    // right-before-left at equal ts makes the match INCLUSIVE
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedCols: Seq[Column] = carried.map(c => last(col(c), ignoreNulls = true).over(w).as(c))

    lTagged.unionByName(rTagged.select(lTagged.columns.map(col).toIndexedSeq: _*))
      .select((keys ++ leftOnly).map(col) ++ carriedCols :+ col("__side"): _*)
      .filter(col("__side") === 0)
      .select((left.columns.toSeq ++ carried).map(col): _*)
  }
}
