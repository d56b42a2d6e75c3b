package graft.streaming
import graft.Tables

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: purchases joined to the same user's
  * view events strictly within the preceding hour, both sides
  * streaming — the Structured Streaming rendering of q56's banded
  * range join semantics (inner form).
  *
  * Scale shape: both sides carry a watermark and the join condition
  * bounds event time on both ends, so Spark evicts buffered state as
  * the watermark advances — per-key state is bounded by (watermark
  * delay + interval), not by stream history. Without the time bounds
  * the state store would grow forever; this is the pattern that keeps
  * a 100 TB/day join running. Inner join in append mode: each matched
  * pair is emitted exactly once.
  *
  * With Trigger.AvailableNow over a finite drained source the result
  * equals the batch interval join — exactly what the DuckDB oracle
  * checks.
  */
object StreamStreamJoin {
  private val runId = new AtomicInteger(0)

  def purchaseViewPairs(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, "inner")

  /** LEFT OUTER variant: matched pairs emit on match (inner part);
    * an unmatched purchase emits once, with nulls, when the watermark
    * proves no future view can match it — i.e. after state eviction.
    * A purchase newer than (final watermark) is still "open" when a
    * finite run drains, exactly like q41's open sessions: the oracle
    * subtracts them. */
  def purchaseViewPairsLeftOuter(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, "left_outer")

  /** FULL OUTER variant — both sides null-emit, each at ITS OWN
    * watermark-proof point, completing the join matrix (q66 inner,
    * q71 left-outer). The two sides close asymmetrically because the
    * interval is one-sided: a purchase p matches views in
    * [p_ts − 1h, p_ts), so it is provably unmatched once the global
    * watermark passes p_ts; a view v matches purchases in
    * (v_ts, v_ts + 1h], so it must outlive the watermark by the FULL
    * interval — null emission at watermark > v_ts + 1h. State for
    * both sides stays bounded by (delay + interval); the asymmetric
    * eviction is exactly what the oracle's two cutoffs replay. */
  def purchaseViewPairsFullOuter(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, "full_outer")

  /** LEFT SEMI variant — "purchases preceded by a view", the
    * existence filter as a STREAM-STREAM operator: the left row emits
    * once (on its first match) and carries no right columns, so state
    * on the left can drop a key as soon as one match lands instead of
    * buffering for late additional matches — the cheapest member of
    * the join matrix (q66 inner, q71 left-outer, q222 full-outer; this
    * completes it). Every match arrives before the AvailableNow drain
    * ends, so the final set equals the batch EXISTS the oracle runs. */
  def purchaseViewSemi(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, "left_semi")

  private def run(spark: SparkSession, dir: String,
      joinType: String): DataFrame = {
    // a stream-stream join keeps FOUR state stores per shuffle
    // partition; the partition count is pinned into the checkpoint at
    // first start. State-heavy streaming jobs size this to state
    // volume, not to scan width — 8 here (vs the session's 32) quarters
    // the store/commit overhead; at real scale this would be sized up
    // with the key space.
    StreamTuning.withStatePartitions(spark) {
      runInner(spark, dir, joinType)
    }
  }

  private def runInner(spark: SparkSession, dir: String,
      joinType: String): DataFrame = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_ss_join_${runId.incrementAndGet()}_")
      .toString
    def eventStream(): DataFrame = Tables.eventsStream(spark, dir)
    val purchases = eventStream()
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("event_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = eventStream()
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_event_id"),
        col("user_id").as("v_user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val joined = purchases.join(
      views,
      col("user_id") === col("v_user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") < col("p_ts"),
      joinType)
    val q = (if (joinType == "left_semi")
        joined.select(col("event_id"), col("user_id"),
          col("p_ts")) // semi output carries LEFT columns only
      else joined
        .select(col("event_id"), col("user_id"), col("view_event_id"),
          col("v_ts").as("view_ts")))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$out/result")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.read.parquet(s"$out/result")
    if (joinType == "left_semi") res.orderBy(col("event_id"))
    else res.orderBy(col("event_id"), asc_nulls_first("view_event_id"))
  }

  val queries: Map[String, graft.queries.Q.Fn] = Map(
    "q66_stream_interval_join" -> ((s, dir) => purchaseViewPairs(s, dir)),
    "q71_stream_left_outer_join" ->
      ((s, dir) => purchaseViewPairsLeftOuter(s, dir)),
    "q222_stream_full_outer_join" ->
      ((s, dir) => purchaseViewPairsFullOuter(s, dir)),
    "q317_stream_semi_join" -> ((s, dir) => purchaseViewSemi(s, dir)))

  val oracles: Map[String, String] = Map(
    "q66_stream_interval_join" ->
      """SELECT p.event_id, p.user_id, v.event_id AS view_event_id,
                v.ts AS view_ts
         FROM events p JOIN events v
           ON v.user_id = p.user_id
          AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
          AND epoch_us(v.ts) < epoch_us(p.ts)
         WHERE p.event_type = 'purchase' AND v.event_type = 'view'
         ORDER BY p.event_id, view_event_id""",
    // matched-only semantics: every match arrives before the drain
    // ends, so the final set is the batch EXISTS — no watermark cutoff
    "q317_stream_semi_join" ->
      """SELECT p.event_id, p.user_id, p.ts AS p_ts
         FROM events p
         WHERE p.event_type = 'purchase'
           AND EXISTS (
             SELECT 1 FROM events v
             WHERE v.event_type = 'view'
               AND v.user_id = p.user_id
               AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
               AND epoch_us(v.ts) < epoch_us(p.ts))
         ORDER BY p.event_id""",
    // Matched pairs always emit. An unmatched purchase emits (with
    // nulls) only once the global watermark — min over BOTH streams of
    // (that stream's max event time) minus the 1 h delay — passes its
    // p_ts, proving no future view can match; purchases newer than the
    // final watermark are still buffered when a finite run drains
    // (empirically pinned at sf0.001 and sf0.01: cutoff =
    // min(max purchase ts, max view ts) − 1 h). NULLS FIRST pins
    // DuckDB's null ordering to Spark's asc_nulls_first.
    "q71_stream_left_outer_join" ->
      """WITH purchases AS (
           SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         views AS (
           SELECT event_id AS view_event_id, user_id, ts AS v_ts
           FROM events WHERE event_type = 'view'),
         wm AS (
           SELECT least((SELECT max(ts) FROM purchases),
                        (SELECT max(v_ts) FROM views)) AS w),
         matched AS (
           SELECT p.event_id, p.user_id, v.view_event_id,
                  v.v_ts AS view_ts
           FROM purchases p JOIN views v
             ON v.user_id = p.user_id
            AND epoch_us(v.v_ts) >= epoch_us(p.ts) - 3600000000
            AND epoch_us(v.v_ts) < epoch_us(p.ts)),
         unmatched AS (
           SELECT p.event_id, p.user_id,
                  CAST(NULL AS BIGINT) AS view_event_id,
                  CAST(NULL AS TIMESTAMP) AS view_ts
           FROM purchases p
           WHERE p.event_id NOT IN (SELECT event_id FROM matched)
             AND epoch_us(p.ts) <
                 epoch_us((SELECT w FROM wm)) - 3600000000)
         SELECT * FROM matched
         UNION ALL SELECT * FROM unmatched
         ORDER BY event_id, view_event_id NULLS FIRST""",
    // Both outer legs, each with ITS OWN watermark cutoff: an
    // unmatched purchase closes when the watermark (w − 1 h delay)
    // passes p_ts — cutoff p_ts < w − 1 h, as in q71; an unmatched
    // view must outlive the watermark by the full 1 h interval
    // (purchases in (v_ts, v_ts + 1 h] could still arrive) — cutoff
    // v_ts < w − 2 h. Spark sorts ASC nulls FIRST; pinned explicitly
    // for DuckDB.
    "q222_stream_full_outer_join" ->
      """WITH purchases AS (
           SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         views AS (
           SELECT event_id AS view_event_id, user_id, ts AS v_ts
           FROM events WHERE event_type = 'view'),
         wm AS (
           SELECT least((SELECT max(ts) FROM purchases),
                        (SELECT max(v_ts) FROM views)) AS w),
         matched AS (
           SELECT p.event_id, p.user_id, v.view_event_id,
                  v.v_ts AS view_ts
           FROM purchases p JOIN views v
             ON v.user_id = p.user_id
            AND epoch_us(v.v_ts) >= epoch_us(p.ts) - 3600000000
            AND epoch_us(v.v_ts) < epoch_us(p.ts)),
         unmatched_p AS (
           SELECT p.event_id, p.user_id,
                  CAST(NULL AS BIGINT) AS view_event_id,
                  CAST(NULL AS TIMESTAMP) AS view_ts
           FROM purchases p
           WHERE p.event_id NOT IN (SELECT event_id FROM matched)
             AND epoch_us(p.ts) <
                 epoch_us((SELECT w FROM wm)) - 3600000000),
         unmatched_v AS (
           SELECT CAST(NULL AS BIGINT) AS event_id,
                  CAST(NULL AS BIGINT) AS user_id,
                  v.view_event_id, v.v_ts AS view_ts
           FROM views v
           WHERE v.view_event_id NOT IN
                 (SELECT view_event_id FROM matched)
             AND epoch_us(v.v_ts) <
                 epoch_us((SELECT w FROM wm)) - 7200000000)
         SELECT * FROM matched
         UNION ALL SELECT * FROM unmatched_p
         UNION ALL SELECT * FROM unmatched_v
         ORDER BY event_id NULLS FIRST, view_event_id NULLS FIRST""")
}
