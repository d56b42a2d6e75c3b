package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 dimension maintenance — versioned attribute history
  * with validity intervals, the standard warehouse rendering of
  * "what did this key look like at time T?". The reference's upsert
  * (store/Merge, store/JdbcUpsert) is type 1 (overwrite in place);
  * this is the history-keeping sibling.
  *
  * Row shape: (keys…, attrs…, valid_from, valid_to, is_current) where
  * valid_to is NULL on the open (current) version and versions chain
  * gaplessly: next.valid_from == prev.valid_to.
  *
  * Two forms:
  *  - [[fromChangeLog]]: rebuild the full history from an event log —
  *    per-key windows only (lag to collapse consecutive identical
  *    attribute values, lead to close intervals). Everything shuffles
  *    once on the key; no global window, no driver state. This is the
  *    backfill path.
  *  - [[mergeIncrement]]: fold one new batch of changes into an
  *    existing SCD2 table — open versions whose key changed are
  *    closed, new versions appended. Only the INCREMENT's keys are
  *    rewritten (broadcast-join discipline like Merge); history rows
  *    of untouched keys pass through unread at the logical level.
  *    Scd2Spec proves batch-by-batch folding equals the one-shot
  *    rebuild, so the incremental path can run daily at 100 TB while
  *    staying bit-equal to the backfill definition.
  */
object Scd2 {

  /** Build the versioned history from a change log. Ties on
    * (key, ts) are broken deterministically by `tieBreak` (arg-max:
    * the row with the LARGEST tieBreak value wins the timestamp).
    * Consecutive versions with an unchanged attribute are collapsed
    * into one interval. */
  def fromChangeLog(log: DataFrame, keys: Seq[String], ts: String,
      attr: String, tieBreak: String): DataFrame = {
    val k = keys.map(col)
    // one winner per (key, ts): deterministic arg-max
    val dedup = log.groupBy((k :+ col(ts)): _*)
      .agg(max_by(col(attr), col(tieBreak)).as(attr))
    val w = Window.partitionBy(k: _*).orderBy(col(ts))
    dedup
      .withColumn("__prev", lag(col(attr), 1).over(w))
      // keep version starts: first row per key, or an attribute change
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(
        Window.partitionBy(k: _*).orderBy(col(ts))))
      .withColumn("is_current", col("valid_to").isNull)
      .select((k :+ col(attr) :+ col("valid_from") :+ col("valid_to")
        :+ col("is_current")): _*)
  }

  /** Fold one increment of change rows into an existing SCD2 table
    * (shape as produced by [[fromChangeLog]]). Correct under the
    * append-only contract: every increment timestamp is ≥ every
    * timestamp already folded for that key (the daily-batch case).
    * Keys untouched by the increment pass through unchanged. */
  def mergeIncrement(state: DataFrame, increment: DataFrame,
      keys: Seq[String], ts: String, attr: String,
      tieBreak: String): DataFrame = {
    val k = keys.map(col)
    // the increment's own mini-history
    val inc = fromChangeLog(increment, keys, ts, attr, tieBreak)
    // current open version per touched key
    val touched = inc.select(k: _*).distinct()
    val open = state.filter(col("is_current"))
      .join(touched, keys, "left_semi")
    val untouchedOrClosed = state
      .join(inc.select(k: _*).distinct(), keys, "left_anti")
      .unionByName(state.filter(!col("is_current"))
        .join(touched, keys, "left_semi"))
    // stitch: collapse the boundary if the first incoming version has
    // the same attribute as the open one; else close the open version
    // at the first incoming valid_from
    val firstIncoming = inc
      .withColumn("__rn", row_number().over(
        Window.partitionBy(k: _*).orderBy(col("valid_from"))))
      .filter(col("__rn") === 1)
      .select((k :+ col(attr).as("__new_attr")
        :+ col("valid_from").as("__new_from")): _*)
    val openJoined = open.join(firstIncoming, keys, "left")
    val openKept = openJoined
      .withColumn("__same", col("__new_attr").isNotNull &&
        col("__new_attr") === col(attr))
      .withColumn("valid_to",
        when(col("__new_attr").isNull || col("__same"), col("valid_to"))
          .otherwise(col("__new_from")))
      .withColumn("is_current",
        col("__new_attr").isNull || col("__same"))
      .select((k :+ col(attr) :+ col("valid_from") :+ col("valid_to")
        :+ col("is_current") :+ col("__same")): _*)
    // incoming versions: drop the first if it merged into the open row;
    // extend the collapsed open row's interval instead (it stays open
    // until the increment's SECOND version, which the lead already set)
    val mergedKeys = openKept.filter(col("__same")).select(k: _*)
    val incKept = inc
      .withColumn("__rn", row_number().over(
        Window.partitionBy(k: _*).orderBy(col("valid_from"))))
      .join(mergedKeys, keys, "left_anti")
      .drop("__rn")
      .unionByName(
        inc.withColumn("__rn", row_number().over(
            Window.partitionBy(k: _*).orderBy(col("valid_from"))))
          .join(mergedKeys, keys, "left_semi")
          .filter(col("__rn") > 1)
          .drop("__rn"))
    // a collapsed open row absorbs the first incoming version, but its
    // valid_to must then extend to that version's valid_to
    val firstTo = inc
      .withColumn("__rn", row_number().over(
        Window.partitionBy(k: _*).orderBy(col("valid_from"))))
      .filter(col("__rn") === 1)
      .select((k :+ col("valid_to").as("__first_to")): _*)
    val openFinal = openKept.join(firstTo, keys, "left")
      .withColumn("valid_to",
        when(col("__same"), col("__first_to")).otherwise(col("valid_to")))
      .withColumn("is_current",
        when(col("__same"), col("__first_to").isNull)
          .otherwise(col("is_current")))
      .drop("__same", "__first_to")
    untouchedOrClosed.unionByName(openFinal).unionByName(incKept)
  }
}
