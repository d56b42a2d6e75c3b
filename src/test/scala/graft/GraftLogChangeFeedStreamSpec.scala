package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftLog

/** Streaming CHANGE DATA FEED: the q334 batch surface as a
  * micro-batch source. Offsets are snapshot tokens, so triggers step
  * through COMMITS (never a fraction of one) and a checkpointed
  * consumer resumes from an exact table version. Pins: a drained
  * stream is row-identical to the batch feed over the same span;
  * maxCommitsPerTrigger slices batches at commit boundaries (each
  * batch IS one commit's changeSet); a restart emits only what was
  * committed after the checkpoint; resuming past a vacuumed
  * generation fails loudly.
  */
class GraftLogChangeFeedStreamSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  /** Drain the CDF stream from `since` with foreachBatch, collecting
    * (batchId, event_id, _change_type) triples. */
  private def drain(src: String, cp: String, since: String,
      maxCommits: Option[Int] = None):
      Seq[(Long, Long, String)] = {
    val got = mutable.ArrayBuffer.empty[(Long, Long, String)]
    var r = spark.readStream.format(fmt)
      .option("readChangeFeed", "true")
      .option("sinceVersion", since)
    maxCommits.foreach(k => r = r.option("maxCommitsPerTrigger", k))
    val q = r.load(src)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.select($"event_id", $"_change_type")
          .collect()
          .foreach(x => got.synchronized {
            got += ((id, x.getLong(0), x.getString(1)))
          })
        ()
      }
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    got.toSeq
  }

  private def batchCdf(src: String, since: String): Seq[(Long, String)] =
    spark.read.format(fmt).option("readChangeFeed", "true")
      .option("sinceVersion", since).load(src)
      .select($"event_id", $"_change_type")
      .as[(Long, String)].collect().toSeq

  test("a drained stream is row-identical to the batch feed; " +
      "maxCommitsPerTrigger slices at commit boundaries") {
    val src = tmpDir("glog-cdfs-src").toString
    feed(0, 400).write.format(fmt).mode("append")
      .option("shards", 4).save(src)
    val tok0 = GraftLog.currentVersion(src)
    // three commits: a rewrite (range delete), then two appends
    GraftLog.deleteWhere(src, 0L, 49L)
    feed(400, 500).write.format(fmt).mode("append")
      .option("shards", 1).save(src)
    feed(500, 550).write.format(fmt).mode("append")
      .option("shards", 1).save(src)

    val cp = tmpDir("glog-cdfs-cp").toString
    val rows = drain(src, cp, tok0, maxCommits = Some(1))
    val expect = batchCdf(src, tok0)
    assert(rows.map(t => (t._2, t._3)).sorted === expect.sorted,
      "stream drain == batch CDF over the same token span")
    // one commit per trigger: 3 commits → 3 non-empty batches, and
    // each batch equals that commit's own changeSet
    val byBatch = rows.groupBy(_._1)
    assert(byBatch.size === 3, s"expected 3 batches, saw ${byBatch.size}")
    val toks = tok0 +: GraftLog.commitTokensAfter(src, tok0)
    toks.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      val perCommit = spark.read.format(fmt)
        .option("readChangeFeed", "true")
        .option("sinceVersion", a).option("version", b).load(src)
        .select($"event_id", $"_change_type")
        .as[(Long, String)].collect().toSeq.sorted
      val batch = byBatch(i.toLong).map(t => (t._2, t._3)).sorted
      assert(batch === perCommit, s"batch $i == commit $b's changeSet")
    }
  }

  test("a restart emits only commits after the checkpoint") {
    val src = tmpDir("glog-cdfs-src2").toString
    feed(0, 200).write.format(fmt).mode("append")
      .option("shards", 2).save(src)
    val tok0 = GraftLog.currentVersion(src)
    feed(200, 260).write.format(fmt).mode("append")
      .option("shards", 1).save(src)
    val cp = tmpDir("glog-cdfs-cp2").toString
    val first = drain(src, cp, tok0)
    assert(first.map(_._2).sorted === (200L until 260L).toSeq,
      "first drain sees the first append only")
    // commit more, restart from the same checkpoint
    GraftLog.deleteWhere(src, 0L, 99L)
    val second = drain(src, cp, tok0)
    assert(second.nonEmpty && second.forall(t =>
      t._3 == "delete" || t._3 == "insert"))
    // net(first ∪ second) == batch CDF tok0→head
    val all = (first ++ second).map(t => (t._2, t._3))
    val expect = batchCdf(src, tok0)
    // the two-step feed may route through an intermediate snapshot
    // the one-shot diff never sees; the NET (inserts minus deletes)
    // must agree
    def net(xs: Seq[(Long, String)]): Map[Long, Int] =
      xs.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(v => if (v._2 == "insert") 1 else -1).sum
      }.filter(_._2 != 0)
    assert(net(all) === net(expect),
      "net of streamed batches == net of the one-shot batch CDF")
  }

  test("resuming past a vacuumed generation fails loudly") {
    val src = tmpDir("glog-cdfs-src3").toString
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 2).save(src)
    val tok0 = GraftLog.currentVersion(src)
    GraftLog.deleteWhere(src, 0L, 9L) // rewrite: bumps the generation
    GraftLog.vacuum(src, retainGenerations = 0, minAgeMs = 0L)
    val cp = tmpDir("glog-cdfs-cp3").toString
    val e = intercept[Exception] {
      val q = spark.readStream.format(fmt)
        .option("readChangeFeed", "true")
        .option("sinceVersion", tok0).load(src)
        .writeStream.format("noop")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.exception.foreach(throw _)
    }
    assert(e.getMessage != null)
  }

  test("a malformed sinceVersion fails at stream start, not mid-run") {
    val src = tmpDir("glog-cdfs-src4").toString
    feed(0, 10).write.format(fmt).mode("append")
      .option("shards", 1).save(src)
    val cp = tmpDir("glog-cdfs-cp4").toString
    val e = intercept[Exception] {
      val q = spark.readStream.format(fmt)
        .option("readChangeFeed", "true")
        .option("sinceVersion", "not-a-token").load(src)
        .writeStream.format("noop")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.exception.foreach(throw _)
    }
    assert(e.getMessage != null)
  }
}
