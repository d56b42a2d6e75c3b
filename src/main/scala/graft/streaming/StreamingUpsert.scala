package graft.streaming
import graft.Tables

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Q
import graft.store.Merge

/** Streaming keyed upsert — the streaming rendering of the
  * reference's Redshift upsert (store.Merge): every micro-batch folds
  * into a durable parquet state table via
  * `Merge.mergeIntoParquetPrecedence`, the CDC apply whose winner per
  * key is chosen by precedence (latest event time, then largest event
  * id) across state AND batch — so the folded result is independent
  * of micro-batch arrival order (the latest-BATCH-wins form would let
  * a late batch clobber newer state). After the stream drains, the
  * state table holds exactly the latest event per key — which is what
  * the DuckDB oracle checks; batch-by-batch fold ≡ one-shot dedup is
  * additionally pinned for a REAL multi-batch split in
  * StreamingUpsertSpec (an AvailableNow drain of one file is a single
  * batch).
  *
  * At 100 TB this is the foreachBatch CDC-apply pattern; partition
  * the state table and combine with mergeIntoPartitioned's dynamic
  * overwrite so only touched partitions rewrite per batch.
  */
object StreamingUpsert {
  private val runId = new AtomicInteger(0)

  /** Precedence for "latest wins": event time desc, id desc. */
  private def precedence = Seq(col("ts").desc, col("event_id").desc)

  def streamedLatestPerUser(spark: SparkSession, dir: String): DataFrame =
    StreamTuning.withStatePartitions(spark) {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_stream_upsert_${runId.incrementAndGet()}_")
      .toString
    val state = s"$out/state"
    val q = Tables.eventsStream(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Merge.mergeIntoParquetPrecedence(batch.sparkSession, state, batch,
          keys = Seq("user_id"), precedence = precedence)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(state).orderBy(col("user_id"))
  }

  val queries: Map[String, Q.Fn] = Map(
    "q112_stream_upsert" -> ((s, dir) => streamedLatestPerUser(s, dir)))

  val oracles: Map[String, String] = Map(
    // ts ranks and renders at MICROsecond precision (epoch_us /
    // make_timestamp): Spark truncates the parquet TIMESTAMP_NS to µs
    // on read (Tables.table), so a testdata refresh that introduces
    // sub-µs ts must not flip the precedence winner or the hash.
    "q112_stream_upsert" ->
      """SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                event_id, event_type, value FROM (
           SELECT user_id, ts, event_id, event_type, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1
         ORDER BY user_id""")
}
