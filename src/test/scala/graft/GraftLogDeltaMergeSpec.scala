package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Delta-based (merge-on-read) MERGE INTO — the default route for
  * `MERGE INTO glog.t` (Spark's `WriteDelta` plan via
  * `SupportsDelta`): a selective merge commits as deletion-vector
  * sidecars + promoted delta shards with ZERO copy-on-write rewrites
  * of settled data, while shards whose suppressed fraction crosses
  * the dense-fallback threshold are rewritten in place by executor
  * tasks in the SAME atomic swap. Pins: the sparse economics
  * (settled bytes untouched, counters quiet), the dense routing at
  * the threshold (both sides), CDF ≡ snapshot diff across the merge,
  * snapshot retention, prior-dv interplay, constraint gating, the
  * full-sync BY SOURCE shape, and the cow-mode escape hatch. */
class GraftLogDeltaMergeSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  private var seq = 0
  private def freshTable(n: Int, shards: Int): (String, String) = {
    seq += 1
    val base = tmpDir("glog-dm").toString
    spark.conf.set(s"spark.sql.catalog.dm$seq",
      "graft.sources.GraftLogCatalog")
    spark.conf.set(s"spark.sql.catalog.dm$seq.base", base)
    feed(0, n).write.format(fmt).mode("append")
      .option("shards", shards).save(s"$base/t")
    (s"dm$seq.t", s"$base/t")
  }

  private def gen(t: String) =
    """g(\d+)\.""".r.findFirstMatchIn(t).get.group(1).toLong

  test("selective MERGE commits as dv + delta shards, zero rewrites") {
    val (tbl, dir) = freshTable(800, 8) // 100 rows per shard
    val tok0 = GraftLog.currentVersion(dir)
    val before = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    val rw0 = GraftLog.shardsRewritten.get()
    val gr0 = GraftLog.groupsReplaced.get()
    // 8 updates scattered across every shard (1% of each) + 4 inserts
    (0L until 8L).map(i => (i * 100 + 7, -1.0))
      .toDF("event_id", "value")
      .union(Seq((900L, 9.0), (901L, 9.0), (902L, 9.0), (903L, 9.0))
        .toDF("event_id", "value"))
      .createOrReplaceTempView("dm_src1")
    spark.sql(
      s"""MERGE INTO $tbl t USING dm_src1 s ON t.event_id = s.event_id
          WHEN MATCHED THEN UPDATE SET value = s.value
          WHEN NOT MATCHED THEN INSERT
            (event_id, ts, user_id, event_type, value)
            VALUES (s.event_id, TIMESTAMP_NTZ'2024-01-02 00:00:00',
                    0, 'merged', s.value)""")
    val after = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    val newShards = after.filterNot(s => before.contains(s))
    assert(after.intersect(before) === before,
      "every settled shard is byte-untouched")
    assert(newShards.nonEmpty, "the delta shard(s) hold the new rows")
    assert(GraftLog.shardsRewritten.get() === rw0 &&
      GraftLog.groupsReplaced.get() === gr0,
      "no copy-on-write rewrite anywhere")
    assert(gen(GraftLog.currentVersion(dir)) === gen(tok0) + 1,
      "exactly one commit")
    // dv sidecars landed for the 8 touched shards
    val dvDir = Paths.get(dir, "_dv")
    assert(Files.isDirectory(dvDir) &&
      Files.list(dvDir).iterator().asScala.count(
        _.getFileName.toString.endsWith(".dv")) === 8)
    // merged state is exact
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 804L)
    assert(cur.filter($"value" === -1.0).count() === 8L)
    assert(cur.filter($"event_type" === "merged").count() === 4L)
    assert(cur.filter($"event_id" === 107L).select($"value")
      .as[Double].head() === -1.0)
    // the pre-merge snapshot still reads the OLD state
    val old = spark.read.format(fmt).option("version", tok0).load(dir)
    assert(old.count() === 800L)
    assert(old.filter($"event_id" === 107L).select($"value")
      .as[Double].head() === 7.0)
  }

  test("CDF across a delta merge reconciles with the snapshot diff") {
    val (tbl, dir) = freshTable(400, 4)
    val tok0 = GraftLog.currentVersion(dir)
    Seq((10L, -1.0), (210L, -2.0), (900L, 9.0))
      .toDF("event_id", "value").createOrReplaceTempView("dm_src2")
    spark.sql(
      s"""MERGE INTO $tbl t USING dm_src2 s ON t.event_id = s.event_id
          WHEN MATCHED THEN UPDATE SET value = s.value
          WHEN NOT MATCHED THEN INSERT
            (event_id, ts, user_id, event_type, value)
            VALUES (s.event_id, TIMESTAMP_NTZ'2024-01-02 00:00:00',
                    0, 'merged', s.value)""")
    val cols = Seq($"event_id", $"ts", $"user_id", $"event_type",
      $"value")
    val cdf = spark.read.format(fmt).option("readChangeFeed", "true")
      .option("sinceVersion", tok0).load(dir).localCheckpoint()
    val dels = cdf.filter($"_change_type" === "delete").select(cols: _*)
    val ins = cdf.filter($"_change_type" === "insert").select(cols: _*)
    val snapA = spark.read.format(fmt).option("version", tok0).load(dir)
    val snapB = spark.read.format(fmt).load(dir)
    assert(dels.except(snapA.except(snapB)).isEmpty &&
      snapA.except(snapB).except(dels).isEmpty,
      "CDF deletes ≡ rows that left the table")
    assert(ins.except(snapB.except(snapA)).isEmpty &&
      snapB.except(snapA).except(ins).isEmpty,
      "CDF inserts ≡ rows that entered the table")
  }

  test("dense shards fall back to an in-place rewrite at the threshold") {
    val (tbl, dir) = freshTable(400, 4) // shards of 100 rows
    val rw0 = GraftLog.shardsRewritten.get()
    // shard 1 ([100,199]): 60 matched rows (60% > 0.5 → dense);
    // shard 3 ([300,399]): 5 matched rows (5% → sparse dv)
    val before = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    (100L until 160L).map((_, -1.0))
      .union((300L until 305L).map((_, -2.0)))
      .toDF("event_id", "value").createOrReplaceTempView("dm_src3")
    spark.sql(
      s"""MERGE INTO $tbl t USING dm_src3 s ON t.event_id = s.event_id
          WHEN MATCHED THEN UPDATE SET value = s.value""")
    assert(GraftLog.shardsRewritten.get() === rw0 + 1,
      "exactly the dense shard rewrote")
    val after = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    // the dense shard kept its NAME but changed content (fewer rows);
    // the sparse + untouched shards are byte-identical
    val shard1 = before(1)._1
    assert(after.map(_._1).contains(shard1), "in-place promote")
    assert(after.find(_._1 == shard1).get._2 < before(1)._2,
      "the rewritten shard physically dropped its suppressed lines")
    assert(after.filter(s => s._1 != shard1 && before.contains(s))
      .size === 3, "the other three settled shards untouched")
    // exactly ONE dv landed (the sparse shard's); the dense shard
    // carries none — its suppressions were applied physically
    val dvs = Files.list(Paths.get(dir, "_dv")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".dv")).toSeq
    assert(dvs.size === 1 && dvs.head.startsWith(
      Paths.get(before(3)._1).getFileName.toString))
    // state is exact either way
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 400L)
    assert(cur.filter($"value" === -1.0).count() === 60L)
    assert(cur.filter($"value" === -2.0).count() === 5L)
  }

  test("threshold 0 forces every touched shard dense (pure CoW)") {
    val (tbl, dir) = freshTable(200, 2)
    spark.conf.set("spark.graft.merge.dv.maxSuppressedFraction", "0.0")
    try {
      val rw0 = GraftLog.shardsRewritten.get()
      Seq((10L, -1.0), (110L, -2.0)).toDF("event_id", "value")
        .createOrReplaceTempView("dm_src4")
      spark.sql(
        s"""MERGE INTO $tbl t USING dm_src4 s ON t.event_id = s.event_id
            WHEN MATCHED THEN UPDATE SET value = s.value""")
      assert(GraftLog.shardsRewritten.get() === rw0 + 2,
        "both touched shards rewrote")
      assert(!Files.isDirectory(Paths.get(dir, "_dv")) ||
        Files.list(Paths.get(dir, "_dv")).iterator().asScala
          .forall(!_.getFileName.toString.endsWith(".dv")),
        "no vectors at threshold 0")
      assert(spark.read.format(fmt).load(dir)
        .filter($"value" < 0).count() === 2L)
    } finally spark.conf
      .unset("spark.graft.merge.dv.maxSuppressedFraction")
  }

  test("spark.graft.merge.mode=cow forces the group-based rewrite") {
    val (tbl, dir) = freshTable(200, 2)
    spark.conf.set("spark.graft.merge.mode", "cow")
    try {
      val gr0 = GraftLog.groupsReplaced.get()
      Seq((10L, -1.0)).toDF("event_id", "value")
        .createOrReplaceTempView("dm_src5")
      spark.sql(
        s"""MERGE INTO $tbl t USING dm_src5 s ON t.event_id = s.event_id
            WHEN MATCHED THEN UPDATE SET value = s.value""")
      assert(GraftLog.groupsReplaced.get() > gr0,
        "cow mode routes through the ReplaceData group rewrite")
      assert(spark.read.format(fmt).load(dir)
        .filter($"event_id" === 10L).select($"value")
        .as[Double].head() === -1.0)
    } finally spark.conf.unset("spark.graft.merge.mode")
  }

  test("a delta merge composes with PRIOR vectors and compacts clean") {
    val (tbl, dir) = freshTable(300, 3)
    // pre-existing dv on shard 0 via a point delete
    spark.sql(s"DELETE FROM $tbl WHERE event_id IN (1, 2, 3)")
    Seq((10L, -1.0), (11L, -1.0)).toDF("event_id", "value")
      .createOrReplaceTempView("dm_src6")
    spark.sql(
      s"""MERGE INTO $tbl t USING dm_src6 s ON t.event_id = s.event_id
          WHEN MATCHED THEN UPDATE SET value = s.value""")
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 297L, "prior deletes stay suppressed")
    assert(cur.filter($"value" === -1.0).count() === 2L)
    assert(cur.filter($"event_id".isin(1L, 2L, 3L)).count() === 0L)
    // compact flattens vectors + delta shards into a clean layout
    GraftLog.compact(spark, dir, 2)
    val flat = spark.read.format(fmt).load(dir)
    assert(flat.count() === 297L)
    assert(flat.filter($"value" === -1.0).count() === 2L)
  }

  test("MERGE full-sync (BY SOURCE delete) stays exact on the delta path") {
    val (tbl, dir) = freshTable(300, 3)
    // source: keep 2/3 of rows with bumped values → every shard dense
    feed(0, 300).filter($"event_id" % 3 =!= 0)
      .withColumn("value", $"value" + 1.0)
      .createOrReplaceTempView("dm_src7")
    spark.sql(
      s"""MERGE INTO $tbl t USING dm_src7 s ON t.event_id = s.event_id
          WHEN MATCHED THEN UPDATE SET value = s.value
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 200L)
    assert(cur.filter($"event_id" % 3 === 0).count() === 0L)
    // every surviving row took the bumped value
    assert(cur.filter($"value" =!= ($"event_id" % 100)
      .cast("double") + 1.0).count() === 0L)
  }

  test("scattered UPDATE routes through deletion vectors BY DEFAULT; " +
      "a range-predicated one takes the dense in-place rewrite; " +
      "update.mode=cow escapes to the group rewrite") {
    val (tbl, dir) = freshTable(800, 8)
    val before = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    val rw0 = GraftLog.shardsRewritten.get()
    val gr0 = GraftLog.groupsReplaced.get()
    // every 100th row — scattered across all 8 shards, 1% each: the
    // density decision keeps every shard SPARSE → dv + delta shard,
    // zero conf required (r14 default routing)
    spark.sql(s"UPDATE $tbl SET value = -1 WHERE event_id % 100 = 0")
    val after = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    assert(after.intersect(before) === before,
      "settled shards byte-untouched")
    assert(GraftLog.shardsRewritten.get() === rw0 &&
      GraftLog.groupsReplaced.get() === gr0,
      "zero copy-on-write rewrites")
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 800L)
    assert(cur.filter($"value" === -1.0)
      .select($"event_id").as[Long].collect().sorted.toSeq ===
      (0L until 800L by 100L))
    // a RANGE-predicated UPDATE (all 100 rows of the first shard)
    // crosses the dense threshold: the SAME default route rewrites
    // that shard in place — the group-shaped cost, chosen at the
    // measured fraction, not by a static conf
    val rw1 = GraftLog.shardsRewritten.get()
    spark.sql(s"UPDATE $tbl SET value = -3 WHERE event_id < 100")
    assert(GraftLog.shardsRewritten.get() > rw1,
      "a whole-shard predicate takes the dense in-place rewrite")
    assert(GraftLog.groupsReplaced.get() === gr0,
      "still no group-based CoW commit")
    assert(spark.read.format(fmt).load(dir)
      .filter($"value" === -3.0).count() === 100L)
    // escape hatch: =cow forces the group-based path
    spark.conf.set("spark.graft.update.mode", "cow")
    try {
      spark.sql(s"UPDATE $tbl SET value = -2 WHERE event_id = 105")
      assert(GraftLog.groupsReplaced.get() > gr0,
        "update.mode=cow keeps the pruned group rewrite")
      assert(spark.read.format(fmt).load(dir)
        .filter($"value" === -2.0).count() === 1L)
    } finally spark.conf.unset("spark.graft.update.mode")
  }

  test("scattered predicate DELETE commits as pure deletion vectors " +
      "BY DEFAULT; delete.mode=cow escapes to the group rewrite") {
    val (tbl, dir) = freshTable(800, 8)
    val before = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    val rw0 = GraftLog.shardsRewritten.get()
    val gr0 = GraftLog.groupsReplaced.get()
    // % predicate: folds to neither a range nor an IN-set, so it
    // takes the row-level fallback — dv sidecars only, no conf
    spark.sql(s"DELETE FROM $tbl WHERE event_id % 160 = 7")
    assert(GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1) === before,
      "NO new shards and no rewrites — the delete is pure metadata")
    assert(GraftLog.shardsRewritten.get() === rw0 &&
      GraftLog.groupsReplaced.get() === gr0)
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 795L)
    assert(cur.filter($"event_id" % 160 === 7).count() === 0L)
    // escape hatch: =cow restores the group-based CoW fallback
    spark.conf.set("spark.graft.delete.mode", "cow")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE user_id % 19 = 3 AND " +
        "event_id % 2 = 1")
      assert(GraftLog.groupsReplaced.get() > gr0,
        "delete.mode=cow keeps the group rewrite")
    } finally spark.conf.unset("spark.graft.delete.mode")
  }

  test("CHECK constraints gate delta-merge inserts and updates") {
    val (tbl, dir) = freshTable(100, 1)
    GraftLog.addConstraint(spark, dir, "v_nonneg", "value >= 0")
    val tok = GraftLog.currentVersion(dir)
    Seq((10L, -5.0)).toDF("event_id", "value")
      .createOrReplaceTempView("dm_src8")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl t USING dm_src8 s ON t.event_id = s.event_id
            WHEN MATCHED THEN UPDATE SET value = s.value""")
    }
    assert(e.getMessage.contains("v_nonneg") ||
      e.getCause != null && e.getCause.getMessage.contains("v_nonneg"))
    assert(GraftLog.currentVersion(dir) === tok,
      "a rejected merge commits nothing")
    assert(spark.read.format(fmt).load(dir)
      .filter($"event_id" === 10L).select($"value")
      .as[Double].head() === 10.0)
  }

  test("merge-on-read UPDATE round-trips evolved columns (typed " +
      "slots render through the delta writer)") {
    val (tbl, dir) = freshTable(400, 4)
    GraftLog.addColumn(dir, "w",
      org.apache.spark.sql.types.LongType, Some("7"))
    GraftLog.addColumn(dir, "ok",
      org.apache.spark.sql.types.BooleanType, Some("true"))
    // rows 400-449 carry explicit w/ok; earlier rows read defaults
    feed(400, 450)
      .withColumn("w", $"event_id" * 2L)
      .withColumn("ok", $"event_id" % 2 === 0)
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val rw0 = GraftLog.shardsRewritten.get()
    val gr0 = GraftLog.groupsReplaced.get()
    // scattered: updates rows in BOTH the default-era shards and the
    // typed shard — the delta writer must re-render every slot
    spark.sql(s"UPDATE $tbl SET w = w + 1, ok = NOT ok " +
      "WHERE event_id % 50 = 2")
    assert(GraftLog.shardsRewritten.get() === rw0 &&
      GraftLog.groupsReplaced.get() === gr0, "pure merge-on-read")
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 450L)
    // default-era row 2: w 7→8, ok true→false
    assert(cur.filter($"event_id" === 2L)
      .select($"w", $"ok").as[(Long, Boolean)].head() === ((8L, false)))
    // typed row 402 (402 % 50 = 2): w 804→805, ok true→false
    assert(cur.filter($"event_id" === 402L)
      .select($"w", $"ok").as[(Long, Boolean)].head() === ((805L, false)))
    // untouched rows keep their values/defaults
    assert(cur.filter($"event_id" === 6L)
      .select($"w", $"ok").as[(Long, Boolean)].head() === ((7L, true)))
    assert(cur.filter($"event_id" === 440L)
      .select($"w", $"ok").as[(Long, Boolean)].head() === ((880L, true)))
  }

  test("insert-heavy merge spills sorted runs — heap-capped, same " +
      "bytes as the in-heap path") {
    val (tbl, dir) = freshTable(200, 2)
    // 1 000 inserts per the single source partition with a 4-row
    // in-heap cap: the writer MUST spill (~250 runs), CROSS the
    // 64-open-runs collapse threshold (multi-pass merge), and the
    // final k-way merge must land one correctly-sorted,
    // correctly-counted shard
    spark.conf.set("spark.graft.merge.delta.spillRowsPerTask", "4")
    try {
      spark.range(1000, 2000).coalesce(1)
        .select($"id".as("event_id"), ($"id" % 100).cast("double")
          .as("value"))
        .createOrReplaceTempView("dm_spill_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dm_spill_src s
            ON t.event_id = s.event_id
            WHEN NOT MATCHED THEN INSERT
              (event_id, ts, user_id, event_type, value)
              VALUES (s.event_id, TIMESTAMP_NTZ'2024-01-02 00:00:00',
                      0, 'bulk', s.value)""")
    } finally
      spark.conf.unset("spark.graft.merge.delta.spillRowsPerTask")
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 1200L)
    assert(cur.filter($"event_type" === "bulk").count() === 1000L)
    assert(cur.filter($"event_id" >= 1000L).agg(sum($"event_id"))
      .as[Long].head() === (1000L until 2000L).sum)
    // the merged shard kept the within-shard event_id order and an
    // exact sidecar; no spill litter remains
    val delta = GraftLog.listShards(dir).sortBy(_.file).last
    assert(delta.stats.contains((1000L, 1999L, 1000L)))
    val ids = Files.readAllLines(Paths.get(delta.file)).asScala.toSeq
      .filter(_.nonEmpty)
      .map(l => l.substring(0, l.indexOf('|')).toLong)
    assert(ids === ids.sorted, "k-way merge preserves sort order")
    assert(!Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.contains(".run")),
      "spill runs are cleaned up at commit")
  }
}
