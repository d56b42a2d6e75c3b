package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous global sequence numbers under a total order — the
  * DataFrame rendering of `zipWithIndex`, and the scale-safe
  * replacement for `row_number() OVER (ORDER BY …)` with no
  * PARTITION BY, which Spark plans as a SINGLE-partition window (one
  * task sorts and numbers the whole table — a non-starter at 100 TB).
  *
  * Shape: one range exchange (sampled bounds, parallel per-partition
  * sorts — the same shape as a global ORDER BY), then a per-partition
  * local index from `monotonically_increasing_id`, whose layout is
  * `(partitionId << 33) | rowInPartition`. Per-partition row counts
  * are one tiny aggregate (#partitions rows — thousands at 100 TB,
  * KBs on the driver, the same bounded-model class as IVF centroids);
  * their prefix sums ride back into the plan as a map literal. No
  * second full-data shuffle, no driver materialization of rows.
  *
  * The assigned sequence equals the row's rank in the total order, so
  * it is independent of where the sampled range bounds happen to fall
  * — `order` must be total (include a unique tiebreaker) or ties get
  * arbitrary-but-contiguous numbers. The sorted+numbered frame is
  * pinned with `localCheckpoint` so the counts job and the consuming
  * query see the SAME partition boundaries (range-bound sampling is
  * not re-run between passes).
  *
  * Primary consumer: fixed-size training-shard manifests (global_seq
  * div shardSize), where contiguity — not mere orderedness (q65's
  * deterministic shuffle) — is the contract: every shard but the last
  * has exactly shardSize rows.
  */
object GlobalIndex {

  private val LocalMask = (1L << 33) - 1

  /** Append `seqCol` = 1-based contiguous rank of each row under
    * `order` (which must be a total order). */
  def withGlobalSeq(df: DataFrame, order: Seq[Column],
      seqCol: String = "global_seq"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint()
    val pid = shiftright(col("__rid"), 33).cast("int")
    // bounded collect: one count per partition (thousands at 100 TB)
    val counts = sorted.groupBy(pid.as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until n).map { p =>
        val off = p -> acc
        acc += counts.getOrElse(p, 0L)
        off
      }.toMap
    }
    sorted
      .withColumn(seqCol,
        element_at(typedlit(offsets), pid) +
          (col("__rid").bitwiseAND(lit(LocalMask))) + 1L)
      .drop("__rid")
  }

  /** Append BOTH `seqCol` (1-based contiguous rank, as
    * [[withGlobalSeq]]) and `sumCol` = running total of `value` under
    * `order` — the distributed prefix sum, and the scale-safe
    * replacement for `SUM(v) OVER (ORDER BY …)` with no PARTITION BY
    * (a single-task window at 100 TB). Same two-phase shape: one
    * range exchange + per-partition local running sums (a window
    * partitioned BY the physical partition id — parallel), plus one
    * bounded per-partition aggregate whose exclusive prefix totals
    * ride back in as a map literal. `order` must be total; `value`
    * must be integral (summed exactly as long — a double here would
    * reintroduce order-dependent rounding, see [[graft.queries.Q.dsum]]).
    * Primary consumer: vocabulary coverage curves (q167), where
    * "smallest vocab reaching X‰ of tokens" is a predicate on the
    * global cumulative frequency. */
  def withGlobalCumSum(df: DataFrame, order: Seq[Column], value: Column,
      sumCol: String = "global_csum",
      seqCol: String = "global_seq"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__v", value.cast("long"))
      .withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint()
    val pid = shiftright(col("__rid"), 33).cast("int")
    // bounded collect: one (count, sum) per partition
    // coalesce: sum() of an all-null partition (value.cast("long") of
    // null inputs) is null, and getLong on it would NPE — the operator
    // is generic even though current callers never pass nulls
    val perPart = sorted.groupBy(pid.as("__pid"))
      .agg(count(lit(1)).as("__c"),
        coalesce(sum(col("__v")), lit(0L)).as("__s"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    var accC = 0L
    var accS = 0L
    val cOff = Map.newBuilder[Int, Long]
    val sOff = Map.newBuilder[Int, Long]
    (0 until n).foreach { p =>
      cOff += p -> accC
      sOff += p -> accS
      val (pc, ps) = perPart.getOrElse(p, (0L, 0L))
      accC += pc
      accS += ps
    }
    // within-partition running sum: window partitioned by the PHYSICAL
    // partition — every partition numbers itself in parallel. `order`
    // is total, so the default RANGE frame has no peer groups.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pid).orderBy(order: _*)
    sorted
      .withColumn(seqCol, element_at(typedlit(cOff.result()), pid) +
        (col("__rid").bitwiseAND(lit(LocalMask))) + 1L)
      .withColumn(sumCol,
        element_at(typedlit(sOff.result()), pid) + sum(col("__v")).over(w))
      .drop("__rid", "__v")
  }
}
