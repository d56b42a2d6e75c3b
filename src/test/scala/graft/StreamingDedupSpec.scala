package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Hashed, Kept}

/** Cross-batch semantics of the streaming exact dedup: min id wins
  * within a batch, the earlier batch wins across batches, re-delivered
  * hashes never re-emit. */
class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  test("first batch claims the hash; later duplicates are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Hashed]
    val table = "stream_dedup_spec"
    val q = StreamingDedup.dedupStream(source.toDS())
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: hash A twice (ids 7, 3 -> min 3 kept), hash B once
      source.addData(Hashed(7, "A"), Hashed(3, "A"), Hashed(10, "B"))
      q.processAllAvailable()
      // batch 2: hash A re-delivered with a SMALLER id (1) -> still
      // dropped (batch 1 claimed it); new hash C kept
      source.addData(Hashed(1, "A"), Hashed(20, "C"))
      q.processAllAvailable()
      val kept = spark.table(table).as[Kept].collect()
        .map(k => k.content_hash -> k.doc_id).toMap
      assert(kept === Map("A" -> 3L, "B" -> 10L, "C" -> 20L))
    } finally q.stop()
  }
}
