package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark semantics in append mode: finalized windows emit once the
  * watermark passes their end, and sufficiently late events are
  * dropped. Note Spark's two-watermark subtlety (3.4+): the
  * late-event filter uses the watermark from one batch EARLIER than
  * eviction does, so a drop is only observable when the late row
  * arrives ≥2 batches after the event that advanced the watermark. */
class WatermarkSpec extends SparkSuite {
  import spark.implicits._

  private def row(eid: Long, t: String, v: Double) =
    (eid, Timestamp.valueOf(t), v)

  test("append-mode windowed agg drops late data and emits finalized windows") {
    val dir = tmpDir("wm-in")
    // b1: the 10:00 window + a 12:00 event → watermark 11:50
    val b1 = Seq(
      row(1, "2024-01-01 10:00:00", 1.0),
      row(2, "2024-01-01 10:05:00", 2.0),
      row(3, "2024-01-01 12:00:00", 4.0))
    // b2: 13:00 → watermark 12:50; 10:00 window evicted this batch
    val b2 = Seq(row(4, "2024-01-01 13:00:00", 8.0))
    // b3: a LATE event for the finalized 10:00 window (late-event
    // watermark is now 11:50 → dropped) + 14:00 to finalize 13:00
    val b3 = Seq(
      row(5, "2024-01-01 10:03:00", 100.0),
      row(6, "2024-01-01 14:00:00", 16.0))
    Seq(("b1", b1, 0L), ("b2", b2, 1L), ("b3", b3, 2L)).foreach {
      case (name, rows, order) =>
        val f = dir.resolve(s"$name.parquet")
        rows.toDF("event_id", "ts", "value").coalesce(1)
          .write.parquet(f.toString)
        Files.walk(f).forEach(p => Files.setLastModifiedTime(
          p, FileTime.fromMillis(1_700_000_000_000L + order * 100_000L)))
    }

    val q = spark.readStream
      .schema(b1.toDF("event_id", "ts", "value").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"w.start".as("window_start"), $"n", $"total")
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("wm_test").collect()
      .map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("2024-01-01 10:00:00.0") === ((2L, 3.0)),
      "late event (100.0) dropped — 10:00 window emitted with 2 events")
    assert(out("2024-01-01 12:00:00.0") === ((1L, 4.0)))
    assert(out("2024-01-01 13:00:00.0") === ((1L, 8.0)))
    assert(!out.contains("2024-01-01 14:00:00.0"),
      "open window (watermark not past its end) is not emitted in append mode")
    val dropped = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped === 1L, s"exactly the one late row dropped, got $dropped")
  }
}
