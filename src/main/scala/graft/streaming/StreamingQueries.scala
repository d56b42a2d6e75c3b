package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Q

/** Structured-Streaming analytics over the events feed: the streaming
  * rendering of the batch windowed aggregation (q21), run with
  * Trigger.AvailableNow into a `foreachBatch` → parquet sink. Because
  * event-time tumbling windows are deterministic and the trigger
  * drains all available input, the streaming result equals the batch
  * result — which is exactly what the DuckDB oracle checks.
  *
  * Sink choice: a memory sink materializes the whole result on the
  * driver and regrows every batch in complete mode — fine for unit
  * tests, wrong at scale. foreachBatch overwrites a parquet table
  * with each complete-mode snapshot, so the result stays distributed
  * end to end and downstream readers see a normal table.
  */
object StreamingQueries {
  private val runId = new AtomicInteger(0)

  /** Per-day, per-type counts and exact decimal sums over a stream of
    * the events parquet. Complete output mode (no watermark needed for
    * a drained finite source). Returns a reader over the parquet sink. */
  def streamedTumblingCounts(spark: SparkSession, dir: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS): stream it as raw longs, convert
    // like Tables.table does for batch
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_stream_counts_${runId.incrementAndGet()}_")
      .toString
    // glob form: the file stream source requires a directory or glob
    // basePath; events.parquet is a single file
    val q = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Q.dsum(col("value")).as("total_value"))
      .select(col("w.start").cast("date").as("day"), col("event_type"),
        col("n_events"), col("total_value"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // complete mode: each batch carries the full refreshed
        // aggregate — overwrite is the snapshot semantics
        batch.write.mode("overwrite").parquet(s"$out/result")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$out/result").orderBy(col("day"), col("event_type"))
  }

  val queries: Map[String, Q.Fn] = Map(
    "q35_stream_tumbling" -> ((s, dir) => streamedTumblingCounts(s, dir)))

  val oracles: Map[String, String] = Map(
    "q35_stream_tumbling" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
            count(1) AS n_events, ${Q.dsumSql("value")} AS total_value
          FROM events
          GROUP BY day, event_type
          ORDER BY day, event_type""")
}
