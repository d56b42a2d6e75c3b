package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

import graft.Tables
import graft.queries.Q

/** Gap sessionization with EVENT-TIME TIMERS — the transformWithState
  * capability neither flatMapGroupsWithState (q41) nor the q168
  * census exercises: a session that no later event ever closes is
  * closed by the WATERMARK instead. q41's contract must leave each
  * user's last session un-emitted (nothing arrives to close it); here
  * the processor registers a timer at the open session's
  * end + gap, and when the watermark passes it, the session emits and
  * its state clears — the idle-key eviction a production 100 TB
  * session store needs (state stays bounded by ACTIVE users, not
  * all users ever seen).
  *
  * Determinism contract (what lets a DuckDB oracle replay a timer):
  * events stream time-ordered here (single-file drain = one data
  * batch; the spec's multi-batch runs split on time boundaries), the
  * processor sorts each batch's per-user rows, and the close decision
  * is an exact integer comparison — a timer registered at
  * `floor((end_us + gap_us)/1000) + 1` ms fires iff the FINAL
  * watermark (floor(max_ts_us/1000) under delay 0, reached in the
  * no-data batch AvailableNow runs after the drain) is ≥ that expiry.
  * TimerSessionizeSpec pins the boundary (`wm_ms == expiry`) so a
  * Spark-side change to the firing comparison would fail loudly, not
  * skew hashes.
  *
  * Value sums accumulate as scale-4 decimal-as-long (exact,
  * associative — the [[StatefulSessionize]] discipline).
  */
object TimerSessionize {
  private val runId = new AtomicInteger(0)

  val GapSeconds = 1800L

  /** ts_us: event time in epoch µs (exact); the watermark column
    * rides separately as a TimestampType `ts`. */
  final case class Ev(user_id: Long, event_id: Long, ts_us: Long,
      value: Double)
  final case class Sess(user_id: Long, session_seq: Long, start_us: Long,
      end_us: Long, n_events: Long, session_value: Double,
      closed_by: String) // "gap" | "timer"
  final case class Open(seq: Long, start: Long, end: Long, n: Long,
      sumScaled: Long)

  private def scaled(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def toSess(uid: Long, o: Open, by: String): Sess =
    Sess(uid, o.seq, o.start, o.end, o.n,
      java.math.BigDecimal.valueOf(o.sumScaled, 4).doubleValue(), by)

  /** Timer expiry for an open session: the first whole millisecond
    * strictly after end + gap. */
  private def expiryMs(endUs: Long, gapUs: Long): Long =
    Math.floorDiv(endUs + gapUs, 1000L) + 1L

  /** Two named state variables per key — the composability v2 adds:
    * `open` (the live session accumulator) and `last_seq` (the
    * session counter, which must SURVIVE a timer eviction so the next
    * session keeps counting; clearing the only state blob — the
    * flatMapGroupsWithState shape — would restart numbering at 1).
    * Spark fires expired timers BEFORE a batch's input rows (pinned
    * in TimerSessionizeSpec), so a session can be timer-closed
    * mid-stream and its user's next event opens seq + 1. */
  class SessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, Ev, Sess] {
    private val gapUs = gapSeconds * 1000000L
    @transient private var open: ValueState[Open] = _
    @transient private var lastSeq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[Open]("open",
        Encoders.product[Open], TTLConfig.NONE)
      lastSeq = getHandle.getValueState[Long]("last_seq",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def nextSeq: Long =
      (if (lastSeq.exists()) lastSeq.get() else 0L) + 1L

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Sess] = {
      val evs = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = Seq.newBuilder[Sess]
      var cur = if (open.exists()) Option(open.get()) else None
      val prevTimer = cur.map(o => expiryMs(o.end, gapUs))
      evs.foreach { e =>
        cur match {
          case Some(o) if e.ts_us - o.end <= gapUs =>
            cur = Some(o.copy(end = e.ts_us, n = o.n + 1,
              sumScaled = o.sumScaled + scaled(e.value)))
          case Some(o) =>
            out += toSess(key, o, "gap")
            cur = Some(Open(o.seq + 1, e.ts_us, e.ts_us, 1L,
              scaled(e.value)))
          case None =>
            cur = Some(Open(nextSeq, e.ts_us, e.ts_us, 1L, scaled(e.value)))
        }
      }
      cur.foreach { o =>
        open.update(o)
        lastSeq.update(o.seq)
        // one live timer per key: retire the previous session's
        // registration if this batch moved the session end
        val want = expiryMs(o.end, gapUs)
        prevTimer.filter(_ != want).foreach(getHandle.deleteTimer)
        if (!prevTimer.contains(want)) getHandle.registerTimer(want)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Sess] =
      if (!open.exists()) Iterator.empty
      else {
        val o = open.get()
        // stale-timer guard: only close if THIS session's expiry fired
        if (info.getExpiryTimeInMs != expiryMs(o.end, gapUs)) Iterator.empty
        else {
          open.clear() // last_seq stays: numbering continues
          Iterator.single(toSess(key, o, "timer"))
        }
      }
  }

  def sessionize(events: Dataset[Ev], gapSeconds: Long = GapSeconds)
      : Dataset[Sess] = {
    implicit val sessEnc: org.apache.spark.sql.Encoder[Sess] =
      Encoders.product[Sess]
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      .as[Ev](Encoders.product[Ev])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Drain the events table: every session emits — closed by gap
    * in-stream, or by the final watermark's timer sweep. */
  def streamedSessions(spark: SparkSession, dir: String): DataFrame =
    StreamTuning.withStatePartitions(spark) {
      TypeCensus.withRocksDb(spark) {
        import spark.implicits._
        val out = java.nio.file.Files
          .createTempDirectory(s"graft_tmr_${runId.incrementAndGet()}_")
          .toString
        val evs = Tables.eventsStream(spark, dir)
          .select($"user_id", $"event_id",
            expr("unix_micros(ts)").as("ts_us"), $"value")
          .as[Ev]
        val q = sessionize(evs)
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$out/_checkpoint")
          .foreachBatch { (b: Dataset[Sess], _: Long) =>
            b.write.mode("append").parquet(s"$out/result")
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.read.parquet(s"$out/result")
          .select($"user_id", $"session_seq",
            timestamp_micros($"start_us").as("session_start"),
            timestamp_micros($"end_us").as("session_end"),
            $"n_events", $"session_value", $"closed_by")
          .orderBy($"user_id", $"session_seq")
      }
    }

  val queries: Map[String, Q.Fn] = Map(
    "q170_stream_session_timers" -> ((s, dir) => streamedSessions(s, dir)))

  /** Oracle: batch sessionization; a user's LAST session carries
    * closed_by='timer' iff the final watermark floor(max_ts_us/1000)
    * reached its expiry floor((end+gap)/1000)+1 — otherwise it stays
    * open and does not emit. Every earlier session closed by gap. */
  val oracles: Map[String, String] = Map(
    "q170_stream_session_timers" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > ${GapSeconds * 1000000L}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          numbered AS (
            SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
            FROM flagged),
          sessions AS (
            SELECT user_id, session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(1) AS n_events,
                   ${Q.dsumSql("value")} AS session_value
            FROM numbered
            GROUP BY user_id, session_seq),
          wm AS (SELECT epoch_us(max(ts)) // 1000 AS wm_ms FROM events)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 session_start, session_end, n_events, session_value,
                 CASE WHEN session_seq < (SELECT max(session_seq)
                                          FROM sessions m
                                          WHERE m.user_id = s.user_id)
                      THEN 'gap' ELSE 'timer' END AS closed_by
          FROM sessions s, wm
          WHERE session_seq < (SELECT max(session_seq) FROM sessions m
                               WHERE m.user_id = s.user_id)
             OR wm_ms >= (epoch_us(session_end)
                          + ${GapSeconds * 1000000L}) // 1000 + 1
          ORDER BY user_id, session_seq""")
}
