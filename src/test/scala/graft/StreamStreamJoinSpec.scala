package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamStreamJoin, StreamTuning}

/** Pins the stream-stream FULL OUTER join contract (q222): matched
  * pairs emit once; each side null-emits exactly once, at ITS OWN
  * watermark-proof point (the interval is one-sided, so the cutoffs
  * are asymmetric: purchases close at watermark, views must outlive
  * it by the full interval); rows the final watermark has NOT proven
  * unmatched are withheld (still in state — the eviction behavior a
  * 24/7 join's bounded state depends on). */
class StreamStreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1700000000000000L // epoch micros
  private def us(min: Long): Long = T0 + min * 60000000L

  /** events.parquet with a hand-built match matrix; max ts on BOTH
    * sides at +240 min drives the final watermark to +180 (1 h delay):
    *  - purchase@+30 / view@+0, user 100 → the matched pair
    *  - purchase@+0, user 200, no view → closes (0 < wm=180)
    *  - view@+0, user 300, no purchase → closes (0 < wm−60=120:
    *    a view must outlive the watermark by the FULL interval)
    *  - purchase@+170, user 400 → closes too (170 < 180) — the
    *    asymmetry: a VIEW at +170 would stay open
    *  - view@+130, user 500 → open (130 ≥ 120) */
  private def writeFixture(): String = {
    val dir = tmpDir("ssj_").toString
    Seq(
      (1L, us(30), 100L, "purchase", 1.0),
      (2L, us(0), 100L, "view", 1.0),
      (3L, us(0), 200L, "purchase", 1.0),
      (4L, us(0), 300L, "view", 1.0),
      (5L, us(170), 400L, "purchase", 1.0), // < wm: closes
      (6L, us(130), 500L, "view", 1.0), // ≥ wm−interval: stays open
      (7L, us(240), 900L, "purchase", 1.0), // watermark drivers
      (8L, us(240), 901L, "view", 1.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .select($"event_id", timestamp_micros($"ts_us").as("ts"),
        $"user_id", $"event_type", $"value")
      .repartition(1)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("full outer: asymmetric null emission, open rows withheld in state") {
    val dir = writeFixture()
    val rows = StreamStreamJoin.purchaseViewPairsFullOuter(spark, dir)
      .select($"event_id", $"user_id", $"view_event_id")
      .as[(Option[Long], Option[Long], Option[Long])].collect().toSet
    assert(rows === Set(
      (Some(1L), Some(100L), Some(2L)), // matched, emitted once
      (Some(3L), Some(200L), None), // left null — closed at wm
      (Some(5L), Some(400L), None), // left null — 170 < wm=180
      (None, None, Some(4L)))) // right null — closed at wm − interval
    // view 6 (+130 ≥ wm−interval: provably still matchable) and 7/8
    // (at the watermark edge) are withheld: state, not output —
    // the one-sided interval makes the two sides close asymmetrically
  }

  test("full outer: state eviction happened and open rows remain buffered") {
    val dir = writeFixture()
    StreamTuning.withStatePartitions(spark) {
      val out = tmpDir("ssj_out_").toString
      val purchases = Tables.eventsStream(spark, dir)
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts".as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val views = Tables.eventsStream(spark, dir)
        .filter($"event_type" === "view")
        .select($"event_id".as("view_event_id"),
          $"user_id".as("v_user_id"), $"ts".as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val q = purchases.join(views,
          $"user_id" === $"v_user_id" &&
            $"v_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
            $"v_ts" < $"p_ts", "full_outer")
        .select($"event_id", $"view_event_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/_ck")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$out/res")
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val st = q.recentProgress.flatMap(_.stateOperators).lastOption
        .getOrElse(fail("no state operator progress"))
      // all 8 input rows entered join state; only the still-open rows
      // (view 6 and the two watermark drivers 7/8) remain — the
      // emitted-and-closed rows were EVICTED, which is the
      // bounded-state contract a 24/7 join depends on
      assert(st.numRowsTotal == 3,
        s"exactly the open rows stay buffered, got ${st.numRowsTotal}")
    }
  }
}
