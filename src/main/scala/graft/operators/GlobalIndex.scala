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
}
