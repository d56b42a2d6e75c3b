package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming WRITES into the graftlog connector (r12 brief #6):
  * micro-batches land as exactly-once epoch commits — one pure-append
  * swap manifest per epoch carrying the idempotence marker. Pins:
  * a multi-epoch drain equals the batch ingest of the same feed; a
  * replayed epoch commit is detected and dropped; a checkpoint
  * restart re-drains nothing; bucketed sinks refuse.
  */
class GraftLogStreamingSinkSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  test("a multi-epoch drain equals batch ingest; restart re-drains " +
      "nothing") {
    val src = tmpDir("glog-ss-src").toString
    feed(0, 600).write.format(fmt).mode("append")
      .option("shards", 6).save(src)
    val dst = tmpDir("glog-ss-dst").toString
    val cp = tmpDir("glog-ss-cp").toString
    def drain(): Unit = {
      val q = spark.readStream.format(fmt)
        .option("maxShardsPerTrigger", 2) // forces ≥3 epochs
        .load(src)
        .writeStream.format(fmt)
        .option("path", dst)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    val got = spark.read.format(fmt).load(dst)
    assert(got.count() === 600L)
    assert(got.select($"event_id").as[Long].collect().sorted.toSeq ===
      (0L until 600L).toSeq, "drained table equals the batch feed")
    // multiple epochs actually happened (epoch markers recorded)
    val epochs = Files.list(Paths.get(dst, "_epochs")).iterator()
      .asScala.size
    assert(epochs >= 3, s"expected ≥3 epoch commits, saw $epochs")
    // restart from the same checkpoint: nothing new to drain
    drain()
    assert(spark.read.format(fmt).load(dst).count() === 600L,
      "checkpoint restart must not duplicate")
  }

  test("a replayed epoch commit is detected by its marker and dropped") {
    val dst = tmpDir("glog-ss-replay").toString
    Files.createDirectories(Paths.get(dst))
    def stage(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(dst, name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    stage(".shard-00000-1.tmp", Seq("1|1000|1|click|0.5"))
    graft.sources.GraftLog.commitStreamEpoch(dst, "q1", 7L,
      Seq((".shard-00000-1.tmp", "1|1|1", None)))
    assert(spark.read.format(fmt).load(dst).count() === 1L)
    // the replay: same (queryId, epoch), freshly staged tmp
    stage(".shard-00000-2.tmp", Seq("1|1000|1|click|0.5"))
    graft.sources.GraftLog.commitStreamEpoch(dst, "q1", 7L,
      Seq((".shard-00000-2.tmp", "1|1|1", None)))
    assert(spark.read.format(fmt).load(dst).count() === 1L,
      "replayed epoch must not duplicate")
    assert(!Files.exists(Paths.get(dst, ".shard-00000-2.tmp")),
      "the replay's staged tmp is cleaned up")
    // a DIFFERENT epoch with new data still lands
    stage(".shard-00000-3.tmp", Seq("2|1000|2|click|0.5"))
    graft.sources.GraftLog.commitStreamEpoch(dst, "q1", 8L,
      Seq((".shard-00000-3.tmp", "2|2|1", None)))
    assert(spark.read.format(fmt).load(dst).count() === 2L)
  }

  test("a bucketed sink refuses streaming writes") {
    val src = tmpDir("glog-ss-src2").toString
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 1).save(src)
    val dst = tmpDir("glog-ss-bdst").toString
    val cp = tmpDir("glog-ss-bcp").toString
    val e = intercept[Exception] {
      val q = spark.readStream.format(fmt).load(src)
        .withColumn("ub", pmod($"user_id", lit(4L)))
        .writeStream.format(fmt)
        .option("path", dst)
        .option("bucketBy", "user_id").option("buckets", 4)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.exception.foreach(throw _)
    }
    assert(e.getMessage != null)
  }
}
