package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — derive a CDC change log from two snapshots of a
  * keyed table: every key is classified `insert` (new only), `delete`
  * (old only) or `update` (both sides, any compare column differs,
  * null-safe); unchanged keys are dropped. This is the reverse
  * direction of store.Scd2 (which CONSUMES a change log) and the
  * bridge out of snapshot-only sources: lakes that receive daily full
  * dumps turn them into increments here, then feed Merge/Scd2.
  *
  * One full outer shuffle join on the key — the minimal work for a
  * diff without table-format change tracking; at 100 TB both sides
  * bucket/cluster by the key so the join co-locates, and a
  * partition-date predicate bounds the compare window. Presence is
  * tracked with explicit marker columns, so legitimately-NULL data
  * columns never misclassify a row.
  */
object SnapshotDiff {

  /** Change rows between `oldSnap` and `newSnap`. Output: keys…,
    * change_type, then old_<c>/new_<c> for every compare column. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff requires at least one key column")
    val o = oldSnap.select(
      (keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("__in_old")): _*)
    val n = newSnap.select(
      (keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(true).as("__in_new")): _*)
    // keys-only diff (no compare columns) degrades to presence-only
    // insert/delete classification — no key present on both sides is
    // ever a change
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(changed, "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select((keys.map(col) :+ col("change_type")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
