package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for every left row, attach the latest
  * right row with `right.ts <= left.ts` within the same key group —
  * the operator behind trade/quote matching, session attribution,
  * slowly-changing-dimension lookups. Spark has no native ASOF join;
  * rather than a custom SparkPlan, this composes built-ins with the
  * union-and-window technique:
  *
  *   tag left/right → unionByName → per-key window ordered by
  *   (ts, side) → last non-null right payload at or before each row →
  *   keep left rows.
  *
  * Cost: ONE shuffle on the key (same as any keyed join) plus a sort
  * within partitions — no range explosion, no per-row subquery. At
  * 100 TB this is the shape you want: both inputs shuffle once by
  * key, and skewed keys can be pre-salted because the window only
  * needs per-key ordering. Right rows sort before left rows at equal
  * timestamps, so "at or before" is inclusive.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto matched left rows
    *                     (exposed as-is; left columns all survive). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val payload = struct((rightTs +: rightPayload).map(col): _*)
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rp", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right.select((keys.map(col) :+
      col(rightTs).as("__ts") :+ lit(0).as("__side") :+
      payload.as("__rp")): _*)
    // align schemas: right rows carry nulls for left columns
    val leftCols = l.columns.filterNot(r.columns.contains)
    val rPadded = leftCols.foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(l.schema(c).dataType)))
    val unioned = l.unionByName(rPadded.select(l.columns.map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rp")
  }
}

/** Skew-aware equi-join: salt the skewed (large) side into `salts`
  * sub-keys and explode the build side to match — converts one hot
  * key's single monster partition into `salts` even partitions.
  * AQE's skew-join handles many cases at runtime; explicit salting is
  * for the pathological keys you know about (SURVEY.md §7.3: "salting
  * for skew").
  */
object SaltedJoin {
  def inner(large: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, keys :+ "__salt").drop("__salt")
  }
}
