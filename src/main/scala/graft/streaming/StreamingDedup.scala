package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.text.TextFunctions

/** Streaming exact dedup — the on-arrival rendering of the batch
  * hash-dedup (q27): the FIRST document seen per content hash is
  * emitted, every later duplicate is dropped, with the kept id held
  * in `flatMapGroupsWithState` state across micro-batches. Within a
  * batch the winner is the MIN doc id (deterministic regardless of
  * partition/arrival order); across batches the earlier batch wins —
  * exactly the semantics a streaming ingest pipeline needs so a
  * re-delivered document can never re-enter the corpus.
  *
  * Scale: state is one long per distinct content hash — the same
  * cardinality any exact-dedup index carries; at 100 TB an event-time
  * timeout (or a RocksDB state store) bounds the hot set.
  */
object StreamingDedup {

  final case class Hashed(doc_id: Long, content_hash: String)
  final case class Kept(doc_id: Long, content_hash: String)

  /** Emit the first-seen (min-id-within-batch) doc per hash. */
  def dedupStream(docs: Dataset[Hashed]): Dataset[Kept] = {
    implicit val keptEnc = Encoders.product[Kept]
    implicit val stateEnc = Encoders.scalaLong
    implicit val strEnc = Encoders.STRING
    docs.groupByKey(_.content_hash)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (hash: String, it: Iterator[Hashed], state: GroupState[Long]) => {
          if (state.exists) Iterator.empty
          else {
            val keep = it.map(_.doc_id).min
            state.update(keep)
            Iterator.single(Kept(keep, hash))
          }
        })
  }

  private val runId = new AtomicInteger(0)

  /** AvailableNow run over the documents parquet, appending kept rows
    * to a parquet sink (foreachBatch — no driver-side memory sink). */
  def streamedDedup(spark: SparkSession, dir: String): DataFrame = StreamTuning.withStatePartitions(spark) {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_stream_dedup_${runId.incrementAndGet()}_")
      .toString
    val hashed = spark.readStream
      .schema(schema)
      .parquet(s"$dir/documents.parque*")
      .select($"doc_id",
        TextFunctions.normalizedHash($"text").as("content_hash"))
      .as[Hashed]
    val q = dedupStream(hashed)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: Dataset[Kept], _: Long) =>
        batch.write.mode("append").parquet(s"$out/result")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$out/result")
      .select("doc_id", "content_hash")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, graft.queries.Q.Fn] = Map(
    "q61_stream_dedup" -> ((s, dir) => streamedDedup(s, dir)))

  /** Oracle: one surviving (min) id per normalized content hash —
    * identical to the batch exact-dedup canonical set. */
  val oracles: Map[String, String] = Map(
    "q61_stream_dedup" ->
      """SELECT min(doc_id) AS doc_id,
                sha256(array_to_string(list_sort(list_distinct(
                  string_split(text, ' '))), ' ')) AS content_hash
         FROM documents
         GROUP BY content_hash
         ORDER BY doc_id""")
}
