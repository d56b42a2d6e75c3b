package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded time-range join: for each left row, all right rows in the
  * same key group with `rightTs ∈ [leftTs − before, leftTs + after]`.
  *
  * Spark plans a raw range predicate as BroadcastNestedLoop (O(n·m)
  * comparisons); the classic fix is banding: bucket time into bands of
  * width ≥ before+after, equi-join on (key, band) with the left side
  * exploded onto the bands its window can touch, then apply the exact
  * range filter. Each right row lives in EXACTLY one band, so no
  * dedup step is needed; the left explodes onto ≤
  * ⌈(before+after)/width⌉+1 bands (2 at the default width).
  *
  * Scale story: ONE shuffle of each side on (key, band) — the same
  * cost class as a keyed equi-join with a small constant on the
  * exploded side. Band width trades replication (narrow bands) against
  * candidate waste (wide bands); default = the window span.
  * Assumes epoch-positive timestamps (integer `div` = floor there).
  */
object RangeJoin {

  /** @param before window extent before leftTs (inclusive), seconds
    * @param after  window extent after leftTs (inclusive), seconds
    * @param bandSeconds band width, default before+after (capped ≥1s)
    * @param rightPrefix prefix for right columns that collide with left */
  def timeRange(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, before: Long, after: Long,
      bandSeconds: Long = 0L, rightPrefix: String = "r_"): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      "window must have positive extent")
    val widthUs = math.max(1L, if (bandSeconds > 0) bandSeconds
      else before + after) * 1000000L
    val beforeUs = before * 1000000L
    val afterUs = after * 1000000L

    val l = left.withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__band", explode(sequence(
        expr(s"(unix_micros($leftTs) - ${beforeUs}L) div ${widthUs}L"),
        expr(s"(unix_micros($leftTs) + ${afterUs}L) div ${widthUs}L"))))
    val collisions = right.columns.toSet.intersect(left.columns.toSet) --
      keys.toSet
    val r0 = collisions.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, rightPrefix + c))
    val rTs = if (collisions.contains(rightTs)) rightPrefix + rightTs
      else rightTs
    val r = r0.withColumn("__rus", unix_micros(col(rTs)))
      .withColumn("__band", expr(s"unix_micros($rTs) div ${widthUs}L"))

    l.join(r, keys :+ "__band")
      .filter(col("__rus") >= col("__lus") - lit(beforeUs) &&
        col("__rus") <= col("__lus") + lit(afterUs))
      .drop("__lus", "__rus", "__band")
  }
}
