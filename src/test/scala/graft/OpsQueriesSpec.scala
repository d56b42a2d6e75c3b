package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class OpsQueriesSpec extends SparkSuite {
  import spark.implicits._

  /** Synthetic events table dir: `n` events in arrival order
    * (event_id), event time mostly increasing but pulled back by a
    * seeded pseudo-random lateness so every delay bucket is hit. */
  private def eventsDir(n: Int): String = {
    val rnd = new scala.util.Random(42)
    val base = 1700000000000000L // µs
    val rows = (0 until n).map { i =>
      val lateUs = rnd.nextInt(10) match {
        case 0 => rnd.nextInt(90) * 1000000L            // < 90 s
        case 1 => (60 + rnd.nextInt(900)) * 1000000L    // 1-16 min
        case 2 => (900 + rnd.nextInt(4000)) * 1000000L  // 15 min - 1.3 h
        case _ => 0L
      }
      (i.toLong, new Timestamp((base + i * 5000000L - lateUs) / 1000),
        i.toLong % 7, "view", 1.0, "{}")
    }
    val dir = tmpDir("ops_events_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q147 two-phase prefix max == naive global window, all delays") {
    val dir = eventsDir(5000)
    val got = SparkEntry.queries("q147_watermark_advisor")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq

    // naive single-window rendering (the scale-hostile form the
    // two-phase plan must reproduce exactly)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val prevMax = max($"ts").over(Window.orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1))
    val late = ev.withColumn("late_us",
      when(prevMax.isNull, 0L).otherwise(
        greatest(lit(0L), unix_micros(prevMax) - unix_micros($"ts"))))
      .select($"late_us").as[Long].collect()
    val n = late.length.toLong
    val want = Seq(0L, 60L, 300L, 900L, 3600L).map { d =>
      val nl = late.count(_ > d * 1000000L).toLong
      (d, nl, nl * 1000 / n)
    }
    assert(got == want)
    // the synthetic log must exercise real out-of-orderness at
    // several delays, or this test proves nothing
    val byDelay = got.map(r => r._1 -> r._2).toMap
    assert(byDelay(0L) > byDelay(60L))
    assert(byDelay(60L) > byDelay(900L))
    assert(byDelay(900L) > 0L)
  }

  test("q147 in-order log reports zero late events at every delay") {
    val dir = tmpDir("ops_inorder_").toString
    val base = 1700000000000L
    (0 until 500).map(i =>
        (i.toLong, new Timestamp(base + i * 1000L), i.toLong % 3,
          "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q147_watermark_advisor")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r._2 == 0L && r._3 == 0L))
  }

  test("q149 as-of-v2 state equals the batch fold of the raw log") {
    val dir = eventsDir(900)
    val got = SparkEntry.queries("q149_time_travel")(spark, dir)
    // reconstruct version 2 directly from the log (batches 0 and 1)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .filter($"event_id" % 3 =!= 2)
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val want = ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .orderBy($"user_id")
    assert(got.collect().toSeq == want.collect().toSeq)
    // one state row per user seen in the first two batches
    assert(got.count() ==
      ev.select($"user_id").distinct().count())
  }
}
