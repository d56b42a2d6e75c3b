package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Secondary shard indexes (`_index/`): per-shard range and bloom
  * sidecars that prune pushed filters on NON-clustered columns.
  * Pins: a ts range index prunes a time window to the overlapping
  * shards with results identical to the unindexed read; a bloom
  * index prunes absent-key point probes to zero opened shards and
  * shard-local present keys to their one shard; a stale index (shard
  * rewritten in place under its name) is IGNORED — correct rows, no
  * pruning — until rebuilt; validation refusals fail loudly.
  */
class GraftLogIndexSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  /** 400 rows in 4 shards of 100; ts tracks event_id (1 s apart);
    * user_id is SHARD-LOCAL (shard k holds only users 10k..10k+9);
    * event_type is t<shard> — so every secondary column has structure
    * an index can exploit. */
  private def writeShards(): String = {
    val dir = tmpDir("graftlog_idx_").toString
    val rows = (0L until 400L).map(i =>
      (i, 1700000000000000L + i * 1000000L,
        (i / 100L) * 10L + i % 10L, s"t${i / 100}", i * 0.5))
    GraftLog.write(rows, dir, rowsPerShard = 100)
    dir
  }

  test("ts range index prunes a time window; results identical") {
    val dir = writeShards()
    assert(GraftLog.buildIndex(spark, dir, "ts", "range") === 4)
    assert(GraftLog.indexedColumns(dir) === Set("ts"))
    // window [150 s, 250 s) overlaps shards 1 and 2 only
    val lo = java.time.LocalDateTime.ofEpochSecond(
      1700000150L, 0, java.time.ZoneOffset.UTC)
    val hi = java.time.LocalDateTime.ofEpochSecond(
      1700000250L, 0, java.time.ZoneOffset.UTC)
    def windowed() = spark.read.format(fmt).load(dir)
      .filter($"ts" >= lit(lo) && $"ts" < lit(hi))
      .select($"event_id").as[Long].collect().sorted.toSeq
    GraftLog.filesOpened.set(0)
    val got = windowed()
    assert(got === (150L until 250L).toSeq, "window rows exact")
    assert(GraftLog.filesOpened.get() === 2,
      "ts window opens only the two overlapping shards")
  }

  test("bloom index: absent key opens zero shards, shard-local key " +
      "opens one; string columns probe too") {
    val dir = writeShards()
    assert(GraftLog.buildIndex(spark, dir, "user_id", "bloom") === 4)
    assert(GraftLog.buildIndex(spark, dir, "event_type", "bloom") === 4)
    GraftLog.filesOpened.set(0)
    val absent = spark.read.format(fmt).load(dir)
      .filter($"user_id" === 9999L).count()
    assert(absent === 0L)
    assert(GraftLog.filesOpened.get() === 0,
      "a provably-absent key opens no shard")
    GraftLog.filesOpened.set(0)
    val present = spark.read.format(fmt).load(dir)
      .filter($"user_id" === 25L).count() // shard 2's local user
    assert(present === 10L)
    assert(GraftLog.filesOpened.get() === 1,
      "a shard-local key opens exactly its shard")
    GraftLog.filesOpened.set(0)
    val byType = spark.read.format(fmt).load(dir)
      .filter($"event_type" === "t3").count()
    assert(byType === 100L)
    assert(GraftLog.filesOpened.get() === 1,
      "string bloom prunes to the one shard holding t3")
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"event_type" === "nope").count() === 0L)
    assert(GraftLog.filesOpened.get() === 0)
  }

  test("a stale index is ignored after an in-place rewrite — correct " +
      "rows, no pruning — and pruning resumes after rebuild") {
    val dir = writeShards()
    GraftLog.buildIndex(spark, dir, "user_id", "bloom")
    // partial-overlap delete rewrites shard 0 IN PLACE under its name
    GraftLog.deleteWhere(dir, 0L, 49L)
    // user 5 lived in shard 0's deleted half; user 7 survives there.
    // With the stale index the reader must NOT trust shard 0's bloom:
    // correctness first — the rows must be right either way.
    val u7 = spark.read.format(fmt).load(dir)
      .filter($"user_id" === 7L).select($"event_id")
      .as[Long].collect().sorted.toSeq
    assert(u7 === Seq(57L, 67L, 77L, 87L, 97L),
      "rewritten shard serves its post-rewrite rows despite the index")
    // the rewritten shard's index entry is stale → it scans even for
    // an absent probe; the three untouched shards still prune
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"user_id" === 9999L).count() === 0L)
    assert(GraftLog.filesOpened.get() === 1,
      "only the stale-indexed shard scans for an absent key")
    // rebuild: the full absent-key prune returns
    GraftLog.buildIndex(spark, dir, "user_id", "bloom")
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"user_id" === 9999L).count() === 0L)
    assert(GraftLog.filesOpened.get() === 0)
  }

  test("validation: event_id refused, bad kinds refused, range on a " +
      "double refused, unindexed filters not accepted for pruning") {
    val dir = writeShards()
    intercept[IllegalArgumentException] {
      GraftLog.buildIndex(spark, dir, "event_id", "range")
    }
    intercept[IllegalArgumentException] {
      GraftLog.buildIndex(spark, dir, "user_id", "minmaxsketch")
    }
    intercept[IllegalArgumentException] {
      GraftLog.buildIndex(spark, dir, "value", "range")
    }
    // no index on value: the filter stays residual-only and all
    // shards scan — but results are exact
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"value" === 25.0).count() === 1L)
    assert(GraftLog.filesOpened.get() === 4)
  }

  test("CALL glog.index builds the same index from SQL") {
    val dir = writeShards()
    val base = Paths.get(dir).getParent.toString
    val tbl = Paths.get(dir).getFileName.toString
    spark.conf.set("spark.sql.catalog.glogidx",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogidx.base", base)
    val r = spark.sql(
      s"CALL glogidx.index(table => '$tbl', `column` => 'user_id', " +
        "kind => 'bloom')").collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(4))
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"user_id" === 9999L).count() === 0L)
    assert(GraftLog.filesOpened.get() === 0,
      "the SQL-built index prunes like the Scala-built one")
  }

  test("index files are atomic and echo-bound: a torn or foreign file " +
      "never crashes the reader") {
    val dir = writeShards()
    GraftLog.buildIndex(spark, dir, "user_id", "bloom")
    // corrupt one index file in place
    val idx = Files.list(Paths.get(dir, "_index")).iterator()
    val f = idx.next()
    Files.write(f, "bloom|garbage".getBytes("UTF-8"))
    val n = spark.read.format(fmt).load(dir)
      .filter($"user_id" === 25L).count()
    assert(n === 10L, "a malformed index file degrades to a scan")
  }

  test("incremental build touches ONLY the new shards of an append") {
    val dir = writeShards() // 4 shards, users 0..39 shard-local
    assert(GraftLog.buildIndex(spark, dir, "user_id", "bloom") === 4)
    val before = Files.list(Paths.get(dir, "_index")).iterator()
      .asScala.map(p => (p.getFileName.toString,
        new String(Files.readAllBytes(p), "UTF-8"))).toMap
    // append one new shard (users 40..49 — its own key space)
    spark.range(400, 500)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
        (lit(40L) + $"id" % 10L).as("user_id"),
        lit("t4").as("event_type"), ($"id" * 0.5).as("value"))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    // the appended shard is unindexed → a probe into its key space
    // must open it (degrades to unprunable, never wrong)
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"user_id" === 45L).count() === 10L)
    assert(GraftLog.filesOpened.get() >= 1)
    // incremental: exactly the ONE new shard is indexed; the settled
    // index files are byte-untouched
    assert(GraftLog.buildIndexIncremental(
      spark, dir, "user_id", "bloom") === 1)
    val after = Files.list(Paths.get(dir, "_index")).iterator()
      .asScala.map(p => (p.getFileName.toString,
        new String(Files.readAllBytes(p), "UTF-8"))).toMap
    assert(before.forall { case (k, v) => after.get(k).contains(v) },
      "settled index files byte-identical")
    assert(after.size === before.size + 1)
    // pruning payoff restored across the whole table
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"user_id" === 9999L).count() === 0L)
    assert(GraftLog.filesOpened.get() === 0,
      "absent key opens zero shards after the incremental build")
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"user_id" === 45L).count() === 10L)
    assert(GraftLog.filesOpened.get() === 1,
      "the new shard's local key opens exactly that shard")
    // already current → no-op
    assert(GraftLog.buildIndexIncremental(
      spark, dir, "user_id", "bloom") === 0)
  }

  test("incremental range build re-indexes an echo-stale rewrite") {
    val dir = writeShards()
    assert(GraftLog.buildIndex(spark, dir, "ts", "range") === 4)
    // boundary delete rewrites shard 1 in place (echo changes) and
    // drops shard 0 entirely
    spark.sql(s"DELETE FROM ${catalogT(dir)} WHERE event_id < 150")
    // exactly the rewritten shard is stale
    assert(GraftLog.buildIndexIncremental(spark, dir, "ts", "range")
      === 1)
    GraftLog.filesOpened.set(0)
    val lo = java.time.LocalDateTime.ofEpochSecond(
      1700000150L, 0, java.time.ZoneOffset.UTC)
    val hi = java.time.LocalDateTime.ofEpochSecond(
      1700000250L, 0, java.time.ZoneOffset.UTC)
    val got = spark.read.format(fmt).load(dir)
      .filter($"ts" >= lit(lo) && $"ts" < lit(hi))
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(got === (150L until 250L).toSeq)
    assert(GraftLog.filesOpened.get() === 2,
      "the rebuilt index prunes the window to its two shards again")
  }

  test("CALL glog.index(incremental => true) runs the delta pass") {
    val dir = writeShards()
    val tbl = Paths.get(dir).getFileName.toString
    val base = Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogidx2",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogidx2.base", base)
    assert(spark.sql(
      s"CALL glogidx2.index(table => '$tbl', `column` => 'user_id', " +
        "kind => 'bloom', incremental => true)")
      .collect().map(_.getInt(0)).toSeq === Seq(4),
      "on an unindexed table the delta pass IS the full pass")
    assert(spark.sql(
      s"CALL glogidx2.index(table => '$tbl', `column` => 'user_id', " +
        "kind => 'bloom', incremental => true)")
      .collect().map(_.getInt(0)).toSeq === Seq(0), "then a no-op")
  }

  test("the streaming sink maintains existing indexes per epoch") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tmpDir("glog-idxs-src").toString
    GraftLog.write((0L until 600L).map(i =>
      (i, 1700000000000000L + i * 1000000L,
        (i / 100L) * 10L + i % 10L, s"t${i / 100}", i * 0.5)),
      src, rowsPerShard = 100)
    val dst = tmpDir("glog-idxs-dst").toString
    val cp = tmpDir("glog-idxs-cp").toString
    // seed the destination + its index, then stream the rest in
    spark.read.format(fmt).load(src).filter($"event_id" < 100)
      .write.format(fmt).mode("append").option("shards", 1).save(dst)
    assert(GraftLog.buildIndex(spark, dst, "user_id", "bloom") === 1)
    val q = spark.readStream.format(fmt)
      .option("maxShardsPerTrigger", 2)
      .load(src)
      .where($"event_id" >= 100)
      .writeStream.format(fmt)
      .option("path", dst)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.read.format(fmt).load(dst).count() === 600L)
    // every epoch's shards were indexed as they landed: nothing stale
    assert(GraftLog.buildIndexIncremental(
      spark, dst, "user_id", "bloom") === 0,
      "the sink kept the index current — no stale shards remain")
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dst)
      .filter($"user_id" === 9999L).count() === 0L)
    assert(GraftLog.filesOpened.get() === 0,
      "absent-key probe launches zero reads on the streamed table")
  }

  test("RENAME COLUMN carries index files to the new name: pruning " +
      "survives the DDL with ZERO rebuild") {
    val dir = writeShards()
    GraftLog.addColumn(dir, "w", org.apache.spark.sql.types.LongType,
      Some("5"))
    // two appended shards with SHARD-LOCAL w (400s vs 500s), so a
    // range index on w can prove absence per shard
    spark.range(400, 600)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
        ($"id" % 7).as("user_id"), lit("x").as("event_type"),
        lit(1.0).as("value"), expr("(id DIV 100) * 100").as("w"))
      .write.format(fmt).mode("append").option("shards", 2).save(dir)
    assert(GraftLog.buildIndex(spark, dir, "w", "range") === 6)
    def idxListing() = {
      val l = Files.list(Paths.get(dir, "_index"))
      try l.iterator().asScala.map(p => (p.getFileName.toString,
        new String(Files.readAllBytes(p), "UTF-8"))).toMap
      finally l.close()
    }
    val before = idxListing()
    def probe(col: String): Long = {
      GraftLog.filesOpened.set(0)
      spark.read.format(fmt).load(dir)
        .filter(org.apache.spark.sql.functions.col(col) === 400L)
        .agg(count(lit(1))).as[Long].head()
      GraftLog.filesOpened.get()
    }
    assert(probe("w") === 1, "pre-DDL: the 400s shard alone opens")
    GraftLog.renameColumn(dir, "w", "wt")
    // the staled-by-DDL window is CLOSED: the very next probe under
    // the new name prunes identically — no CALL glog.index anywhere
    assert(probe("wt") === 1,
      "post-rename probe opens the same single shard")
    assert(GraftLog.indexedColumns(dir) === Set("wt"))
    val after = idxListing()
    assert(after.keySet ===
      before.keySet.map(_.replace(".w.range", ".wt.range")))
    assert(after.values.toSeq.sorted === before.values.toSeq.sorted,
      "index BYTES are carried, not rebuilt")
    assert(GraftLog.buildIndexIncremental(spark, dir, "wt", "range")
      === 0, "nothing is stale under the new name")
    // correctness unchanged: the renamed column serves its values
    assert(spark.read.format(fmt).load(dir)
      .filter($"wt" === 400L).count() === 100L)
    // DROP genuinely invalidates (values are gone): files removed
    GraftLog.dropColumn(dir, "wt")
    assert(GraftLog.indexedColumns(dir) === Set.empty)
  }

  test("index DDL maintenance matches column names EXACTLY — " +
      "renaming/dropping `w` never touches `kw`'s files") {
    val dir = writeShards()
    GraftLog.addColumn(dir, "w", org.apache.spark.sql.types.LongType,
      Some("1"))
    GraftLog.addColumn(dir, "kw", org.apache.spark.sql.types.LongType,
      Some("2"))
    spark.range(400, 500)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
        ($"id" % 7).as("user_id"), lit("x").as("event_type"),
        lit(1.0).as("value"), $"id".as("w"), ($"id" * 10L).as("kw"))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    GraftLog.buildIndex(spark, dir, "w", "range")
    GraftLog.buildIndex(spark, dir, "kw", "range")
    assert(GraftLog.indexedColumns(dir) === Set("w", "kw"))
    // rename w → w2: kw's files must be untouched (a bare suffix
    // match on ".w.range" would also capture "...graftlog.kw.range")
    GraftLog.renameColumn(dir, "w", "w2")
    assert(GraftLog.indexedColumns(dir) === Set("w2", "kw"))
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"kw" === 99999999L).count() === 0L)
    assert(GraftLog.filesOpened.get() === 0,
      "kw's carried-nothing index still proves absence")
    // drop w2: kw still indexed
    GraftLog.dropColumn(dir, "w2")
    assert(GraftLog.indexedColumns(dir) === Set("kw"))
  }

  test("range index on an evolved DATE column prunes by epoch-day " +
      "tokens") {
    val dir = writeShards()
    GraftLog.addColumn(dir, "day",
      org.apache.spark.sql.types.DateType)
    // two appended shards with disjoint month-local day domains
    spark.range(400, 600)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
        ($"id" % 7).as("user_id"), lit("x").as("event_type"),
        lit(1.0).as("value"),
        date_add(lit("2024-01-01").cast("date"),
          when($"id" < 500, ($"id" % 20).cast("int"))
            .otherwise(lit(40) + ($"id" % 20).cast("int"))).as("day"))
      .write.format(fmt).mode("append").option("shards", 2).save(dir)
    // base shards have NULL day (no default) → range writes nothing
    // for them: they stay unprunable for day probes — correct rows
    assert(GraftLog.buildIndex(spark, dir, "day", "range") === 6)
    def probe(d: String): Long = {
      GraftLog.filesOpened.set(0)
      spark.read.format(fmt).load(dir)
        .filter($"day" === lit(d).cast("date"))
        .agg(count(lit(1))).as[Long].head()
      GraftLog.filesOpened.get()
    }
    // '2024-01-05' lives only in the first appended shard; the 4
    // base shards have NO index entry (all-NULL day) so they open
    assert(probe("2024-01-05") === 5,
      "the second appended shard (days 40-59) proves absence")
    assert(probe("2024-02-15") === 5,
      "day 45 lives only in the second appended shard")
    assert(probe("2030-01-01") === 4,
      "a far-future day opens only the unindexable base shards")
    // results stay exact under pruning
    assert(spark.read.format(fmt).load(dir)
      .filter($"day" === lit("2024-01-05").cast("date")).count() ===
      spark.range(400, 500).filter(expr("id % 20 = 4")).count())
    // incremental maintenance handles the date tokens too
    assert(GraftLog.buildIndexIncremental(spark, dir, "day", "range")
      === 0)
  }

  private def catalogT(dir: String): String = {
    val base = Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogidxd",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogidxd.base", base)
    s"glogidxd.`${Paths.get(dir).getFileName}`"
  }
}
