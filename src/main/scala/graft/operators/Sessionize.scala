package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Gap-based sessionization, in two renderings.
  *
  * [[plain]] is the classic two-window form (lag → new-session flag →
  * running sum), one shuffle on the key. Its scale limit is key skew:
  * the window partitions by user alone, so one hot key (a bot account
  * with 10⁹ events in a 100 TB log) serializes onto one task and can
  * exceed executor memory — SCALE.md's "skewed partition keys would
  * need pre-salting" caveat.
  *
  * [[chunked]] is that pre-salting, made exact. The salt is event
  * time itself: events shuffle on (key, time-chunk), so a hot key's
  * history splits across `timespan / chunkLen` tasks; sessions are
  * built locally per chunk, and chunk-boundary sessions are stitched
  * with a second pass over ONE summary row per (key, chunk) — data
  * volume per key equal to its chunk count, not its event count. The
  * stitch is exact for any chunk length: consecutive events that
  * straddle a boundary are by construction the (last, first) events
  * of consecutive summary rows, so the boundary gap test sees exactly
  * the timestamps the plain form's lag would. Empty chunks cost
  * nothing (no summary row; the gap test uses real timestamps, not
  * chunk adjacency). SessionizeChunkedSpec property-checks equality
  * with [[plain]] over randomized skewed inputs and chunk lengths,
  * including chunks shorter than the gap.
  *
  * Output schema (both forms): key, session_seq (1-based per key),
  * session_start, session_end, n_events, session_value.
  */
object Sessionize {

  private def gapTest(curTs: Column, prevTs: Column, gapMicros: Long): Column =
    prevTs.isNull || unix_micros(curTs) - unix_micros(prevTs) > gapMicros

  /** Single-shuffle window form — optimal while no key is hot. */
  def plain(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, gapMicros: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byKey))
      .withColumn("new_session",
        when(gapTest(col(tsCol), col("prev_ts"), gapMicros), 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        Q.dsum(col(valueCol)).as("session_value"))
  }

  /** Skew-resilient form: local sessions per (key, time-chunk), then
    * an exact cross-chunk stitch over per-chunk summaries. */
  def chunked(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, gapMicros: Long,
      chunkMicros: Long): DataFrame = {
    require(chunkMicros > 0, s"chunkMicros=$chunkMicros must be positive")
    val m = unix_micros(col(tsCol))
    // exact floor division (pmod is non-negative), safe pre-1970 too
    val chunk = ((m - pmod(m, lit(chunkMicros))) / lit(chunkMicros))
      .cast("long")

    val byChunk = Window.partitionBy(col(keyCol), col("chunk"))
      .orderBy(col(tsCol), col(tieCol))
    val local = events
      .withColumn("chunk", chunk)
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byChunk))
      .withColumn("new_session",
        when(gapTest(col(tsCol), col("prev_ts"), gapMicros), 1L).otherwise(0L))
      .withColumn("local_seq", sum(col("new_session")).over(
        byChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // one row per (key, chunk) — the small stitch table; this groupBy
    // reuses the window's (key, chunk) partitioning, no extra shuffle
    val summaries = local.groupBy(col(keyCol), col("chunk"))
      .agg(
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"),
        max(col("local_seq")).as("n_sessions"))

    // stitch: chunk k continues the previous eventful chunk's last
    // session iff the boundary gap (real timestamps) is within gapMicros
    val byKeyChunks = Window.partitionBy(col(keyCol)).orderBy(col("chunk"))
    val offsets = summaries
      .withColumn("prev_last_ts", lag(col("last_ts"), 1).over(byKeyChunks))
      .withColumn("merge_prev",
        when(col("prev_last_ts").isNotNull &&
          unix_micros(col("first_ts")) - unix_micros(col("prev_last_ts"))
            <= gapMicros, 1L).otherwise(0L))
      .withColumn("sessions_before", coalesce(
        sum(col("n_sessions")).over(
          byKeyChunks.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("merges_through", sum(col("merge_prev")).over(
        byKeyChunks.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // global id of a row = offset + local_seq; merged boundaries
      // collapse the first local session onto the previous chunk's last
      .select(col(keyCol), col("chunk"),
        (col("sessions_before") - col("merges_through")).as("offset"))

    local
      .join(offsets, Seq(keyCol, "chunk"))
      .withColumn("session_seq", col("offset") + col("local_seq"))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        Q.dsum(col(valueCol)).as("session_value"))
  }
}
