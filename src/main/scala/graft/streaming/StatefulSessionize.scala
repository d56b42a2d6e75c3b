package graft.streaming
import graft.Tables

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState, Trigger}

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the
  * built-in session_window can't replace when sessions carry custom
  * accumulators. A user's open session lives in the state store
  * across micro-batches; a session is EMITTED only when closed by a
  * later event's gap (append semantics). The still-open last session
  * per user stays in state — exactly the streaming contract — so the
  * batch oracle is "all sessions except each user's last".
  *
  * Determinism: events are sorted (ts, event_id) inside the group
  * function (Spark does not guarantee group-iterator order), and the
  * value sum accumulates as a scale-4 decimal (same HALF_UP semantics
  * as Q.dsum), so output matches the batch/oracle bit-for-bit.
  *
  * Scale: state is one open session per user (constant per key);
  * the per-batch sort is per-user-per-batch. Event-time timeouts
  * would evict idle users in a production run.
  */
object StatefulSessionize {

  /** ts_us: event time as epoch MICROseconds — java.sql.Timestamp
    * round-trips through getTime would truncate to milliseconds and
    * break oracle equality. */
  final case class Ev(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  final case class Session(
      user_id: Long, session_seq: Long,
      session_start: Timestamp, session_end: Timestamp,
      n_events: Long, session_value: Double)
  /** Open-session accumulator; sumScaled is the value sum × 10⁴
    * (exact decimal-as-long, associative). */
  final case class OpenSession(
      seq: Long, start: Long, end: Long, n: Long, sumScaled: Long)

  private def scaled(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def sessionize(events: Dataset[Ev], gapSeconds: Long): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]) => {
          val evs = it.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
          val closed = Seq.newBuilder[Session]
          var open = state.getOption
          evs.foreach { e =>
            val t = e.ts_us
            open match {
              case Some(o) if t - o.end <= gapSeconds * 1000000L =>
                open = Some(o.copy(end = t, n = o.n + 1,
                  sumScaled = o.sumScaled + scaled(e.value)))
              case Some(o) =>
                closed += toSession(uid, o)
                open = Some(OpenSession(o.seq + 1, t, t, 1L, scaled(e.value)))
              case None =>
                open = Some(OpenSession(1L, t, t, 1L, scaled(e.value)))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
        })
  }

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def toSession(uid: Long, o: OpenSession): Session =
    Session(uid, o.seq, tsFromMicros(o.start), tsFromMicros(o.end),
      o.n, java.math.BigDecimal.valueOf(o.sumScaled, 4).doubleValue())

  private val runId = new AtomicInteger(0)

  /** Streaming run over the events parquet with AvailableNow: emits
    * every CLOSED session (the open tail per user remains in state).
    *
    * Sink: `foreachBatch` appending to parquet — closed sessions grow
    * with users × time, so a driver-side memory sink is the wrong
    * shape at scale; the appended parquet table keeps the stream
    * distributed end to end (tests exercise the memory-free
    * [[sessionize]] core directly). */
  def streamedSessions(spark: SparkSession, dir: String,
      gapSeconds: Long = 1800L): DataFrame = StreamTuning.withStatePartitions(spark) {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_stream_sessions_${runId.incrementAndGet()}_")
      .toString
    val evs = Tables.eventsStream(spark, dir)
      .select($"user_id", $"event_id",
        expr("unix_micros(ts)").as("ts_us"), // canonical ts -> epoch micros
        $"value")
      .as[Ev]
    val q = sessionize(evs, gapSeconds)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: Dataset[Session], _: Long) =>
        batch.write.mode("append").parquet(s"$out/result")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$out/result")
      .select("user_id", "session_seq", "session_start", "session_end",
        "n_events", "session_value")
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** CUSTOM-state introspection (q210's statestore read, applied to
    * the flatMapGroupsWithState store): drain the sessionizer, then
    * read its checkpoint back — the live rows are exactly each user's
    * still-OPEN session accumulator (q41 emits only closed sessions;
    * the complement lives in state). The reader surfaces the
    * case-class fields under `value.groupState.*`, epoch-micros longs
    * and the ×10⁴ decimal-as-long sum included — so the hash gate
    * pins the accumulator REPRESENTATION, not just derived output:
    * a drift in the state encoding (the thing checkpoint
    * compatibility depends on) breaks this row. */
  def openSessionState(spark: SparkSession, dir: String,
      gapSeconds: Long = 1800L): DataFrame =
    StreamTuning.withStatePartitions(spark) {
      import spark.implicits._
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_session_state_${runId.incrementAndGet()}_")
        .toString
      val ckpt = s"$out/_checkpoint"
      val evs = Tables.eventsStream(spark, dir)
        .select($"user_id", $"event_id",
          expr("unix_micros(ts)").as("ts_us"), $"value")
        .as[Ev]
      val q = sessionize(evs, gapSeconds)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[Session], _: Long) =>
          b.write.format("noop").mode("overwrite").save()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.format("statestore").load(ckpt)
        .select(col("key.value").as("user_id"),
          col("value.groupState.seq").as("open_seq"),
          col("value.groupState.start").as("open_start_us"),
          col("value.groupState.end").as("open_end_us"),
          col("value.groupState.n").as("n_events"),
          col("value.groupState.sumScaled").as("sum_scaled"))
        .orderBy(col("user_id"))
    }

  val queries: Map[String, graft.queries.Q.Fn] = Map(
    "q41_stream_sessionize" -> ((s, dir) => streamedSessions(s, dir)),
    "q212_state_open_sessions" -> ((s, dir) => openSessionState(s, dir)))

  /** Oracle: the batch sessionization (q23) minus each user's final
    * (still-open in streaming) session. */
  val oracles: Map[String, String] = Map(
    "q41_stream_sessionize" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          numbered AS (
            SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged),
          sessions AS (
            SELECT user_id, session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(1) AS n_events,
                   ${graft.queries.Q.dsumSql("value")} AS session_value
            FROM numbered
            GROUP BY user_id, session_seq)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 session_start, session_end, n_events, session_value
          FROM sessions s
          WHERE session_seq < (SELECT max(session_seq) FROM sessions m
                               WHERE m.user_id = s.user_id)
          ORDER BY user_id, session_seq""",

    // q41's complement: each user's LAST (still-open) session, with
    // the state's own representation — epoch-micros longs and the
    // ×10⁴ decimal-as-long sum (per-event DECIMAL(18,4) HALF_UP, the
    // same rounding BigDecimal.setScale(4, HALF_UP) applies).
    "q212_state_open_sessions" ->
      """WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > 1800000000
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
                   CAST(min(epoch_us(ts)) AS BIGINT) AS open_start_us,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS open_end_us,
                   count(1) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000
                     AS BIGINT) AS sum_scaled
            FROM numbered
            GROUP BY user_id, session_seq)
          SELECT user_id, CAST(session_seq AS BIGINT) AS open_seq,
                 open_start_us, open_end_us, n_events, sum_scaled
          FROM sessions s
          WHERE session_seq = (SELECT max(session_seq) FROM sessions m
                               WHERE m.user_id = s.user_id)
          ORDER BY user_id""")
}
