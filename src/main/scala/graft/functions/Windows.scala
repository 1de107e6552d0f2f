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
}
