package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Hashed, Kept}

/** The RocksDB state store provider — the 100 TB rendering of
  * stateful streaming: state lives off-heap/on-disk per partition
  * instead of in the executor JVM heap, so a billion-key dedup index
  * or session map doesn't compete with shuffle memory. Same
  * semantics, swapped provider; this spec pins that the engine's
  * stateful operators run (and agree) under it.
  */
class RocksDbStateSpec extends SparkSuite {
  import spark.implicits._

  private def runDedup(batches: Seq[Seq[Hashed]]): Seq[Kept] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Hashed]
    val out = tmpDir("rocksdb_dedup").toString
    val q = StreamingDedup.dedupStream(input.toDS())
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (b: Dataset[Kept], _: Long) =>
        b.write.mode("append").parquet(s"$out/result")
      }
      .start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.read.parquet(s"$out/result").as[Kept]
      .collect().sortBy(_.doc_id).toSeq
  }

  test("streaming dedup under RocksDB state store ≡ default provider") {
    val batches = Seq(
      Seq(Hashed(5, "a"), Hashed(3, "a"), Hashed(7, "b")),
      Seq(Hashed(1, "a"), Hashed(2, "c"), Hashed(9, "b")),
      Seq(Hashed(4, "d"), Hashed(6, "d")))
    val default = runDedup(batches)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks =
      try runDedup(batches)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    assert(rocks === default)
    // cross-batch claim semantics hold under RocksDB too: "a" won by
    // id 3 in batch 1, so batch 2's id 1 must NOT re-emit
    assert(rocks.map(k => k.content_hash -> k.doc_id).toMap ===
      Map("a" -> 3L, "b" -> 7L, "c" -> 2L, "d" -> 4L))
  }
}
