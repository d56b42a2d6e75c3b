package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Merge-on-read UPSERT (`GraftLog.mergeRows`): point upserts land as
  * ONE atomic swap commit carrying deletion-vector entries (suppress
  * the old versions) plus one promoted shard (the new versions) —
  * zero copy-on-write rewrites, O(#touched shards) metadata. The
  * metadata-cost sibling of the CoW `MERGE INTO` (q197). */
class MergeRowsSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  private def freshLog(n: Int, shards: Int): String = {
    val dir = tmpDir("glog-mr").toString
    feed(0, n).write.format(fmt).mode("append")
      .option("shards", shards).save(dir)
    dir
  }

  private val TsUs = 1704067200000000L // 2024-01-01T00:00:00 micros

  test("update + insert in one atomic commit, zero rewrites") {
    val dir = freshLog(400, 4)
    val tok0 = GraftLog.currentVersion(dir)
    val before = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    def gen(t: String) =
      """g(\d+)\.""".r.findFirstMatchIn(t).get.group(1).toLong
    // update ids 10/210 (different shards), insert 1000/1001
    val (touched, shard) = GraftLog.mergeRows(dir, Seq(
      (10L, TsUs, 3L, "fixed", 999.0),
      (210L, TsUs, 0L, "fixed", 888.0),
      (1000L, TsUs, 6L, "new", 1.0),
      (1001L, TsUs, 0L, "new", 2.0)))
    assert(touched === 2, "two shards carry old versions")
    val tok1 = GraftLog.currentVersion(dir)
    assert(gen(tok1) === gen(tok0) + 1, "exactly one commit")
    // settled shards untouched; exactly one new shard
    val after = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    assert(after.filterNot(_._1.endsWith(shard)) === before)
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 402L)
    assert(cur.filter($"event_id" === 10L)
      .select($"event_type", $"value").as[(String, Double)].head()
      === (("fixed", 999.0)))
    assert(cur.filter($"event_id" isin (1000L, 1001L)).count() === 2L)
    // the pre-upsert snapshot still reads the OLD versions
    val old = spark.read.format(fmt).option("version", tok0).load(dir)
    assert(old.count() === 400L)
    assert(old.filter($"event_id" === 10L).select($"value")
      .as[Double].head() === 10.0)
  }

  test("the change feed reads the upsert as delete+insert") {
    val dir = freshLog(300, 3)
    val tok0 = GraftLog.currentVersion(dir)
    GraftLog.mergeRows(dir, Seq(
      (42L, TsUs, 0L, "fixed", 424.0),
      (900L, TsUs, 4L, "new", 9.0)))
    val cdf = spark.read.format(fmt).option("readChangeFeed", "true")
      .option("sinceVersion", tok0).load(dir)
      .select($"event_id", $"_change_type")
      .as[(Long, String)].collect().sorted.toSeq
    assert(cdf === Seq((42L, "delete"), (42L, "insert"),
      (900L, "insert")),
      "update = old version deleted + new inserted; pure insert has " +
        "no delete leg")
  }

  test("a CHECK constraint gates the upsert path too") {
    val dir = freshLog(100, 1)
    GraftLog.addConstraint(spark, dir, "v_nonneg", "value >= 0")
    val tok = GraftLog.currentVersion(dir)
    val e = intercept[IllegalArgumentException] {
      GraftLog.mergeRows(dir, Seq(
        (5L, TsUs, 1L, "ok", 1.0),
        (6L, TsUs, 1L, "bad", -1.0)))
    }
    assert(e.getMessage.contains("v_nonneg"))
    assert(GraftLog.currentVersion(dir) === tok,
      "a rejected upsert commits nothing (no generation bump)")
    assert(spark.read.format(fmt).load(dir).count() === 100L)
    assert(spark.read.format(fmt).load(dir)
      .filter($"event_id" === 5L).select($"value").as[Double].head()
      === 5.0, "the valid row of the rejected batch did not land either")
  }

  test("re-upserting a key chains versions; compact flattens them") {
    val dir = freshLog(100, 1)
    GraftLog.mergeRows(dir, Seq((5L, TsUs, 1L, "v1", 1.0)))
    GraftLog.mergeRows(dir, Seq((5L, TsUs, 1L, "v2", 2.0),
      (5L, TsUs, 1L, "v3", 3.0))) // last occurrence wins in one call
    def v5 = spark.read.format(fmt).load(dir)
      .filter($"event_id" === 5L)
      .select($"event_type", $"value").as[(String, Double)]
      .collect().toSeq
    assert(v5 === Seq(("v3", 3.0)), "latest version wins, exactly once")
    assert(spark.read.format(fmt).load(dir).count() === 100L)
    GraftLog.compact(spark, dir, 1)
    assert(v5 === Seq(("v3", 3.0)))
    assert(spark.read.format(fmt).load(dir).count() === 100L)
  }

  test("the point-upsert cap trips on a bulk-sized row set") {
    val dir = freshLog(10, 1)
    val tok = GraftLog.currentVersion(dir)
    val bulk = (0L until (GraftLog.MergeRowsMaxRows + 1L))
      .map(i => (i, TsUs, 1L, "bulk", 0.0))
    val e = intercept[IllegalArgumentException] {
      GraftLog.mergeRows(dir, bulk)
    }
    assert(e.getMessage.contains("MERGE INTO"),
      "the guard points bulk callers at the CoW/dv MERGE path")
    assert(GraftLog.currentVersion(dir) === tok, "nothing committed")
    // the cap is an explicit opt-in knob, not a hard wall
    val (t, _) = GraftLog.mergeRows(dir,
      bulk.take(11).map { case (i, ts, u, ty, v) => (i + 100, ts, u, ty, v) },
      maxRows = 11)
    assert(t === 0, "pure inserts touch no existing shard")
  }
}
