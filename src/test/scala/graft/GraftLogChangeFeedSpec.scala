package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Row-level change data feed: `_change_type` ∈ {insert, delete}
  * between two snapshot tokens, derived from the retention machinery
  * (a rewritten shard contributes its full before/after images —
  * update = delete+insert; the consumer's net reconstructs the exact
  * target state). Pins: append-only feeds, the rewrite boundary, the
  * reconciliation identity net(CDF) ≡ snapshot diff, that the feed
  * opens ONLY the touched shards, and the loud failures (no
  * sinceVersion, vacuumed history).
  */
class GraftLogChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  private def cdf(dir: String, since: String,
      end: Option[String] = None): DataFrame = {
    val r = spark.read.format(fmt).option("readChangeFeed", "true")
      .option("sinceVersion", since)
    end.fold(r)(t => r.option("version", t)).load(dir)
  }

  test("append-only: the feed is exactly the new rows, tagged insert") {
    val dir = tmpDir("glog-cdf").toString
    feed(0, 300).write.format(fmt).mode("append")
      .option("shards", 3).save(dir)
    val t1 = GraftLog.currentVersion(dir)
    feed(300, 500).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    val c = cdf(dir, t1)
    assert(c.groupBy($"_change_type").count().as[(String, Long)]
      .collect().toMap === Map("insert" -> 200L))
    assert(c.agg(min($"event_id"), max($"event_id"))
      .as[(Long, Long)].head() === ((300L, 499L)))
  }

  test("a rewrite boundary: full before/after images; the net equals " +
      "the snapshot diff; only touched shards open") {
    val dir = tmpDir("glog-cdf").toString
    feed(0, 400).write.format(fmt).mode("append")
      .option("shards", 4).save(dir) // 100 ids per shard
    val t1 = GraftLog.currentVersion(dir)
    // delete [0, 149]: shard 0 drops whole, shard 1 rewrites in place
    GraftLog.deleteWhere(dir, 0L, 149L)
    feed(400, 450).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    val t2 = GraftLog.currentVersion(dir)
    GraftLog.filesOpened.set(0L)
    val c = cdf(dir, t1, Some(t2)).localCheckpoint()
    // raw feed: deletes = shard0 (100) + shard1 old image (100);
    // inserts = shard1 new image (50) + the appended shard (50)
    assert(c.groupBy($"_change_type").count().as[(String, Long)]
      .collect().toMap === Map("delete" -> 200L, "insert" -> 100L))
    // the read opened only the touched shards (3 old-side + appended)
    assert(GraftLog.filesOpened.get() === 4L,
      s"CDF must open only touched shards, opened ${GraftLog.filesOpened.get()}")
    val cols = Seq($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val ins = c.filter($"_change_type" === "insert").select(cols: _*)
    val del = c.filter($"_change_type" === "delete").select(cols: _*)
    val netIns = ins.except(del)
    val netDel = del.except(ins)
    val snapA = spark.read.format(fmt).option("version", t1).load(dir)
    val snapB = spark.read.format(fmt).option("version", t2).load(dir)
    val diffIns = snapB.except(snapA)
    val diffDel = snapA.except(snapB)
    assert(netIns.except(diffIns).isEmpty && diffIns.except(netIns).isEmpty,
      "net inserts must equal the snapshot diff B\\A")
    assert(netDel.except(diffDel).isEmpty && diffDel.except(netDel).isEmpty,
      "net deletes must equal the snapshot diff A\\B")
    // and the specific rows: net deletes are exactly ids [0,150)
    assert(netDel.select($"event_id").as[Long].collect().sorted.toSeq ===
      (0L until 150L).toSeq)
    assert(netIns.select($"event_id").as[Long].collect().sorted.toSeq ===
      (400L until 450L).toSeq)
  }

  test("loud failures: missing sinceVersion; vacuumed history") {
    val dir = tmpDir("glog-cdf").toString
    feed(0, 200).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    val t1 = GraftLog.currentVersion(dir)
    val e = intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("readChangeFeed", "true")
        .load(dir).count()
    }
    assert(e.getMessage.contains("sinceVersion"), e.getMessage)
    GraftLog.deleteWhere(dir, 0L, 49L)
    GraftLog.vacuum(dir)
    val e2 = intercept[IllegalArgumentException] { cdf(dir, t1).count() }
    assert(e2.getMessage.contains("vacuum"), e2.getMessage)
  }

  test("a bucketed layout refuses the feed option") {
    val dir = tmpDir("glog-cdf-b").toString
    feed(0, 100).withColumn("ub", pmod($"user_id", lit(4L)))
      .write.format(fmt).mode("append")
      .option("bucketBy", "user_id").option("buckets", 4).save(dir)
    val e = intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("readChangeFeed", "true")
        .option("sinceVersion", "g0.4").load(dir).count()
    }
    assert(e.getMessage.contains("bucketed"), e.getMessage)
  }
}
