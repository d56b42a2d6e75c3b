package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{TimerSessionize, TypeCensus}
import graft.streaming.TimerSessionize.{Ev, Sess}

/** Event-time timers in transformWithState: a user's final session —
  * which q41's flatMapGroupsWithState contract must leave in state —
  * is closed by the watermark's timer sweep. The oracle's close rule
  * is an exact integer comparison on milliseconds, so this spec pins
  * BOTH sides of the boundary (timer at wm == expiry fires; one ms
  * later it does not), plus stale-timer hygiene when a session
  * extends across batches. */
class TimerSessionizeSpec extends SparkSuite {
  import spark.implicits._

  private val Gap = 10L // seconds, spec-sized
  private val GapUs = Gap * 1000000L

  private def run(batches: Seq[Seq[Ev]]): Seq[Sess] =
    TypeCensus.withRocksDb(spark) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val out = tmpDir("tmr_sess").toString
      val q = TimerSessionize.sessionize(input.toDS(), Gap)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$out/_checkpoint")
        .foreachBatch { (b: Dataset[Sess], _: Long) =>
          b.write.mode("append").parquet(s"$out/result")
        }
        .start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.read.parquet(s"$out/result").as[Sess].collect()
        .sortBy(s => (s.user_id, s.session_seq)).toSeq
    }

  test("gap closes in-stream; the watermark's timer closes the tail") {
    val t0 = 1700000000000000L
    val evs = Seq(
      Ev(1, 1, t0, 1.0), Ev(1, 2, t0 + 1000000L, 2.0), // session 1
      Ev(1, 3, t0 + 60000000L, 3.0), // gap>10s → session 2
      // user 2 far in the future: its ts drives the watermark high
      // enough that user 1's session 2 expires too
      Ev(2, 4, t0 + 600000000L, 4.0))
    val got = run(Seq(evs))
    val u1 = got.filter(_.user_id == 1)
    assert(u1.map(s => (s.session_seq, s.n_events, s.closed_by)) ===
      Seq((1L, 2L, "gap"), (2L, 1L, "timer")))
    assert(u1.head.session_value === 3.0)
    // user 2's own session: watermark == its ts floor; expiry is
    // gap past it → still open, nothing emitted
    assert(got.count(_.user_id == 2) === 0)
  }

  test("firing boundary: wm == expiry fires, wm == expiry - 1 ms does not") {
    val t0 = 1700000000000000L
    // session end at t0; expiry = floor((t0 + GapUs)/1000) + 1.
    // A driver event at exactly expiry ms (µs = expiry*1000) sets the
    // final watermark TO the expiry → must fire.
    val expiryMs = Math.floorDiv(t0 + GapUs, 1000L) + 1L
    val fired = run(Seq(Seq(
      Ev(1, 1, t0, 1.0), Ev(9, 2, expiryMs * 1000L, 0.0))))
    assert(fired.exists(s => s.user_id == 1 && s.closed_by == "timer"),
      s"timer at wm==expiry must fire, got $fired")
    // one ms earlier → must NOT fire
    val notFired = run(Seq(Seq(
      Ev(1, 1, t0, 1.0), Ev(9, 2, (expiryMs - 1) * 1000L, 0.0))))
    assert(!notFired.exists(_.user_id == 1),
      s"timer one ms before expiry must stay open, got $notFired")
  }

  test("a session extending across batches retires its stale timer") {
    val t0 = 1700000000000000L
    // batch 1: open session [t0]; batch 2 (within gap): extends it —
    // the old timer (t0+gap) must be deleted, else it would fire
    // mid-life and split the session; batch 3: driver far ahead
    val got = run(Seq(
      Seq(Ev(1, 1, t0, 1.0)),
      Seq(Ev(1, 2, t0 + 5000000L, 2.0)), // +5 s < gap
      Seq(Ev(9, 3, t0 + 600000000L, 0.0))))
    val u1 = got.filter(_.user_id == 1)
    assert(u1.map(s => (s.session_seq, s.n_events, s.closed_by)) ===
      Seq((1L, 2L, "timer")), s"expected ONE whole session, got $u1")
    assert(u1.head.session_value === 3.0)
  }

  test("mid-stream timer eviction: numbering continues, totals match") {
    // 40 events, user = i % 4, every 7 s → per-user spacing 28 s > gap,
    // so each event is its own session. Split into two time-ordered
    // batches: after batch 1 the watermark (133 s) passes the open
    // sessions of users 0 and 1 — Spark fires those timers BEFORE
    // batch 2's input rows (the ordering this test pins), so both are
    // evicted mid-stream and their next event must open seq 6, not a
    // restarted seq 1 (the last_seq state survives the eviction).
    val t0 = 1700000000000000L
    val evs = (0 until 40).map { i =>
      Ev(i % 4, i.toLong, t0 + i.toLong * 7000000L, i * 0.5)
    }
    val got = run(Seq(evs.take(20), evs.drop(20)))
    // final watermark 273 s: u0 (last end 252, expiry 262.001) and
    // u1 (259 → 269.001) get their tails timer-closed in the final
    // sweep; u2 (266 → 276.001) and u3 (273 → 283.001) stay open
    def byUser(u: Long) = got.filter(_.user_id == u)
    assert(byUser(0).size === 10 && byUser(1).size === 10)
    assert(byUser(2).size === 9 && byUser(3).size === 9)
    // u0: seq 5 evicted mid-stream + seq 10 in the final sweep
    assert(byUser(0).filter(_.closed_by == "timer").map(_.session_seq)
      === Seq(5L, 10L))
    assert(byUser(0).map(_.session_seq) === (1L to 10L))
    // u2: all nine closes are gap closes (its timers never expired)
    assert(byUser(2).forall(_.closed_by == "gap"))
    assert(byUser(2).map(_.session_seq) === (1L to 9L))
    // every emitted session is one event with its exact value
    assert(got.forall(_.n_events == 1L))
    val wantValues = evs.groupBy(_.user_id).map { case (u, es) =>
      u -> es.sortBy(_.ts_us).map(_.value)
    }
    got.groupBy(_.user_id).foreach { case (u, ss) =>
      val got_vals = ss.sortBy(_.session_seq).map(_.session_value)
      assert(got_vals === wantValues(u).take(got_vals.size))
    }
  }
}
