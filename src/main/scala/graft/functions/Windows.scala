package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GROUPS window frames, which Trino 468 has and Spark lacks
  * (SURVEY.md §2.3 delta; walden exposes Trino's full frame grammar).
  *
  * Exact emulation: a `GROUPS BETWEEN lo AND hi` frame over ORDER BY k
  * equals a `RANGE BETWEEN lo AND hi` frame over `dense_rank()` on the
  * same ordering — dense_rank numbers peer groups consecutively, so
  * "n peer groups back/forward" becomes "rank difference <= n".
  * One extra window pass, both passes shuffle on the same partition
  * keys (a single exchange at scale).
  */
object Windows {

  /** Add `outName` = `agg` evaluated over a GROUPS BETWEEN lo AND hi
    * frame. `agg` receives no arguments referencing the frame — pass
    * any aggregate Column (e.g. `sum(col("x"))`, `count(lit(1))`).
    *
    * The rank column is internal and dropped; `df` must not already
    * contain `__graft_grp`.
    */
  def withGroupsFrame(df: DataFrame, outName: String, agg: Column,
                      partitionBy: Seq[Column], orderBy: Seq[Column],
                      lo: Long, hi: Long): DataFrame = {
    val rankW =
      if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
      else Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val frameW = {
      val base =
        if (partitionBy.isEmpty) Window.orderBy(col("__graft_grp"))
        else Window.partitionBy(partitionBy: _*).orderBy(col("__graft_grp"))
      base.rangeBetween(lo, hi)
    }
    df.withColumn("__graft_grp", dense_rank().over(rankW))
      .withColumn(outName, agg.over(frameW))
      .drop("__graft_grp")
  }

  /** SQL:2016 window frame exclusion (<window frame exclusion>), which
    * Spark lacks entirely. Decomposition in dense_rank ("GROUPS")
    * space, where every boundary is a static literal:
    *
    *   frame \ group      = [lo, -1] union [+1, hi]        (rank deltas)
    *   frame \ ties       = (frame \ group) + the row's own value
    *   frame \ currentRow = (frame \ group) + (peers \ self)
    *
    * `peers \ self` is not subtractable for MIN/MAX, so it is rebuilt
    * from three peer-frame aggregates (group min/max, count at the
    * extreme, second-best) — all static frames, all over the SAME
    * (partitionBy, rank) ordering, so the whole matrix costs ONE
    * exchange + one sort regardless of how many pieces a kind needs.
    */
  sealed trait FrameExclusion
  case object ExcludeNoOthers extends FrameExclusion
  case object ExcludeCurrentRow extends FrameExclusion
  case object ExcludeGroup extends FrameExclusion
  case object ExcludeTies extends FrameExclusion

  /** Add `outName` = aggregate `kind` of `input` over GROUPS BETWEEN
    * `lo` AND `hi` with the given exclusion. Kinds: "sum", "count"
    * (count(input); pass lit(1) for COUNT(*)), "avg" (exact sum cast
    * to double / count — spell the oracle the same way), "min", "max".
    * Frames that do not contain the current group (e.g. lo=-3, hi=-1)
    * are honored: the exclusion then removes nothing.
    */
  def withGroupsFrameExclude(df: DataFrame, outName: String, kind: String,
                             input: Column, partitionBy: Seq[Column],
                             orderBy: Seq[Column], lo: Long, hi: Long,
                             exclusion: FrameExclusion): DataFrame = {
    require(lo <= hi, s"frame lo=$lo > hi=$hi")
    val kinds = Set("sum", "count", "avg", "min", "max")
    require(kinds(kind), s"unsupported aggregate kind '$kind' (supported: $kinds)")

    val rankW =
      if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
      else Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    def rframe(a: Long, b: Long) = {
      val base =
        if (partitionBy.isEmpty) Window.orderBy(col("__graft_grp"))
        else Window.partitionBy(partitionBy: _*).orderBy(col("__graft_grp"))
      base.rangeBetween(a, b)
    }

    // A piece is (sum, nonNullCount, min, max) over a disjoint row set;
    // emptiness (for SQL NULL-on-empty) is cnt == 0 for the value aggs.
    case class Piece(sum: Column, cnt: Column, min: Column, max: Column)

    val x = input
    var out = df.withColumn("__graft_grp", dense_rank().over(rankW))

    val sideBounds =
      if (exclusion == ExcludeNoOthers) Seq((lo, hi))
      else Seq((lo, math.min(hi, -1L)), (math.max(lo, 1L), hi))
    val sides = sideBounds
      .filter { case (a, b) => a <= b }
      .map { case (a, b) =>
        val w = rframe(a, b)
        Piece(sum(x).over(w), count(x).over(w), min(x).over(w), max(x).over(w))
      }
    val frameHasGroup = lo <= 0 && hi >= 0

    val extra: Option[Piece] = exclusion match {
      case ExcludeGroup => None
      case ExcludeTies if frameHasGroup =>
        // retain the current row itself
        Some(Piece(x, when(x.isNotNull, 1L).otherwise(0L), x, x))
      case ExcludeCurrentRow if frameHasGroup =>
        val wp = rframe(0, 0)
        val peerSum = sum(x).over(wp)
        val peerCnt = count(x).over(wp)
        val pmsCnt = peerCnt - when(x.isNotNull, 1L).otherwise(0L)
        val pmsSum = when(pmsCnt === 0, lit(null))
          .otherwise(when(x.isNull, peerSum).otherwise(peerSum - x))
        if (kind == "min" || kind == "max") {
          // peers \ self for an extreme: the group's extreme unless this
          // row is its sole witness, in which case the second-best.
          // __graft_pmin/__graft_patmin are constant across the peer
          // group, so referencing them inside a peer-frame aggregate is
          // well-defined.
          out = out
            .withColumn("__graft_pmin", min(x).over(wp))
            .withColumn("__graft_pmax", max(x).over(wp))
          val pmin = col("__graft_pmin"); val pmax = col("__graft_pmax")
          out = out
            .withColumn("__graft_natmin",
              count(when(x === pmin, lit(1))).over(wp))
            .withColumn("__graft_natmax",
              count(when(x === pmax, lit(1))).over(wp))
            .withColumn("__graft_min2", min(when(x > pmin, x)).over(wp))
            .withColumn("__graft_max2", max(when(x < pmax, x)).over(wp))
          val pmsMin = when(pmsCnt === 0, lit(null))
            .otherwise(when(x.isNull || x > pmin, pmin)
              .otherwise(when(col("__graft_natmin") > 1, pmin)
                .otherwise(col("__graft_min2"))))
          val pmsMax = when(pmsCnt === 0, lit(null))
            .otherwise(when(x.isNull || x < pmax, pmax)
              .otherwise(when(col("__graft_natmax") > 1, pmax)
                .otherwise(col("__graft_max2"))))
          Some(Piece(pmsSum, pmsCnt, pmsMin, pmsMax))
        } else Some(Piece(pmsSum, pmsCnt, lit(null), lit(null)))
      case _ => None // exclusion targets rows outside the frame
    }

    val pieces = sides ++ extra.toSeq
    val result =
      if (pieces.isEmpty) lit(null)
      else {
        val cntAll = pieces.map(_.cnt).reduce(_ + _)
        kind match {
          case "count" => cntAll
          case "sum" => when(cntAll === 0, lit(null))
            .otherwise(pieces.map(p => coalesce(p.sum, lit(0))).reduce(_ + _))
          case "avg" => when(cntAll === 0, lit(null))
            .otherwise(pieces.map(p => coalesce(p.sum, lit(0))).reduce(_ + _)
              .cast("double") / cntAll)
          case "min" =>
            if (pieces.size == 1) pieces.head.min else least(pieces.map(_.min): _*)
          case "max" =>
            if (pieces.size == 1) pieces.head.max else greatest(pieces.map(_.max): _*)
        }
      }
    out.withColumn(outName, result)
      .drop("__graft_grp", "__graft_pmin", "__graft_pmax",
        "__graft_natmin", "__graft_natmax", "__graft_min2", "__graft_max2")
  }
}
