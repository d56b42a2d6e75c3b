package graft

import org.apache.spark.sql.functions._

import graft.queries.Q
import graft.streaming.StreamingQueries

/** The watermark+append rendering of q35 must equal exactly the
  * closed-window subset of the complete-mode snapshot: every window
  * whose end the watermark (max event time − delay) has passed appears
  * once with identical values, and no open window appears. This is the
  * contract that makes the append form a safe drop-in at scale.
  */
class StreamingAppendSpec extends SparkSuite {
  import spark.implicits._

  test("append-mode tumbling agg equals the closed-window subset of the snapshot") {
    val delay = "12 hours"
    val appended = StreamingQueries
      .streamedTumblingCountsAppend(spark, sf0001, delay)
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3))))
      .toMap

    // batch truth: same aggregation over the same table
    val events = Tables.table(spark, sf0001, "events")
    val batch = events
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), Q.dsum($"value").as("total_value"))
      .select($"w.start".cast("date").as("day"), $"w.end".as("w_end"),
        $"event_type", $"n_events", $"total_value")
    val maxTs = events.agg(max($"ts")).as[java.sql.Timestamp].head()
    val watermarkMicros =
      maxTs.getTime * 1000L + (maxTs.getNanos / 1000L) % 1000L -
        12L * 3600L * 1000000L
    val closed = batch
      .filter(unix_micros($"w_end") <= watermarkMicros)
      .select($"day", $"event_type", $"n_events", $"total_value")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3))))
      .toMap

    assert(closed.nonEmpty, "test needs at least one closed window")
    assert(appended.keySet === closed.keySet,
      s"append emitted ${appended.keySet} but closed windows are ${closed.keySet}")
    closed.foreach { case (k, v) =>
      assert(appended(k) === v, s"window $k: append=${appended(k)} batch=$v")
    }
    // and the subset is proper: the snapshot has at least one open
    // window (the one containing max event time) that append must not
    // have emitted
    val allDays = batch.select($"day", $"event_type").collect()
      .map(r => (r.getDate(0).toString, r.getString(1))).toSet
    assert(appended.keySet.subsetOf(allDays))
    assert((allDays -- appended.keySet).nonEmpty,
      "expected the window containing max(ts) to still be open")
  }
}
