package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.store.Merge

/** Streaming keyed upsert (q112): the single-file AvailableNow drain
  * the driver verifies is one micro-batch, so the cross-batch fold —
  * the property that makes foreachBatch+Merge a correct CDC apply —
  * is pinned here with a REAL 2-batch run (two source files,
  * maxFilesPerTrigger=1): the folded state table must equal the
  * one-shot latest-per-key dedup of all events.
  */
class StreamingUpsertSpec extends SparkSuite {

  test("two real micro-batches fold to the one-shot latest-per-key state") {
    import spark.implicits._
    val events = Tables.table(spark, sf0001, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
    val src = tmpDir("su-src")
    // deterministic 2-way split; distinct mtimes pin batch order
    events.filter($"event_id" % 2 === 0)
      .coalesce(1).write.parquet(src.resolve("part_a").toString)
    events.filter($"event_id" % 2 =!= 0)
      .coalesce(1).write.parquet(src.resolve("part_b").toString)

    val out = tmpDir("su-out")
    val state = out.resolve("state").toString
    val precedence = Seq(col("ts").desc, col("event_id").desc)
    val q = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/part_*")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", out.resolve("_ckpt").toString)
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Merge.mergeIntoParquetPrecedence(batch.sparkSession, state,
            batch, keys = Seq("user_id"), precedence = precedence)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val cols = events.columns.map(col).toIndexedSeq
    val folded = spark.read.parquet(state)
      .select(cols: _*).orderBy($"user_id").collect().toSeq
    val oneShot = Merge.dedupKeyed(events, Seq("user_id"), precedence)
      .select(cols: _*).orderBy($"user_id").collect().toSeq
    assert(folded.nonEmpty)
    assert(folded == oneShot)
    // multiple batches actually ran (two files, one per trigger)
    assert(Files.list(java.nio.file.Paths.get(
      out.resolve("_ckpt").toString, "commits")).count() >= 2)
  }
}
