package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Merge-on-read deletion vectors: `DELETE … WHERE event_id IN (…)`
  * (or `GraftLog.deleteVectors`) records the suppressed keys in tiny
  * per-shard `_dv/` sidecars instead of rewriting shards — zero data
  * I/O at delete time, subtraction at scan time, physical purge at
  * the next compaction. The spec pins the whole contract:
  * suppression, zero-rewrite, snapshot semantics across the dv
  * commit, cumulative vectors, pushdown self-disabling (counts are
  * physical), the CoW-rewrite interplay (no resurrection), change
  * feed dv deltas, compaction purge, retirement co-location, echo
  * staleness, and the truncate/re-ingest name-reuse edge. */
class DeletionVectorSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  /** ids [0, n) in `shards` shards. */
  private def freshLog(n: Int, shards: Int): String = {
    val dir = tmpDir("glog-dv").toString
    feed(0, n).write.format(fmt).mode("append")
      .option("shards", shards).save(dir)
    dir
  }

  private def ids(dir: String, version: Option[String] = None): Seq[Long] = {
    val r = spark.read.format(fmt)
    version.foreach(v => r.option("version", v))
    r.load(dir).select($"event_id").as[Long].collect().sorted.toSeq
  }

  private def shardListing(dir: String): Seq[(String, Long)] =
    GraftLog.listShards(dir).map(s =>
      (Paths.get(s.file).getFileName.toString, s.bytes)).sortBy(_._1)

  private def liveDvFiles(dir: String): Seq[String] = {
    val d = Paths.get(dir, "_dv")
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  test("deleteVectors suppresses scattered keys with zero shard rewrites") {
    val dir = freshLog(400, 4)
    val before = shardListing(dir)
    val rw0 = GraftLog.shardsRewritten.get()
    val gr0 = GraftLog.groupsReplaced.get()
    val dead = Seq(3L, 57L, 120L, 121L, 250L, 399L)
    val touched = GraftLog.deleteVectors(dir, dead)
    assert(touched === 4, "keys span all 4 shards")
    // the delete wrote METADATA only: same shard files, same bytes,
    // no rewrite/replace counter moved
    assert(shardListing(dir) === before, "no shard file changed")
    assert(GraftLog.shardsRewritten.get() === rw0)
    assert(GraftLog.groupsReplaced.get() === gr0)
    assert(liveDvFiles(dir).size === 4)
    assert(ids(dir) === (0L until 400L).filterNot(dead.contains))
    // row-reader path (metadata-column projection) agrees
    val viaRow = spark.read.format(fmt).load(dir)
      .select($"event_id", col("_shard"))
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(viaRow === (0L until 400L).filterNot(dead.contains))
  }

  test("snapshot tokens straddle the dv commit correctly") {
    val dir = freshLog(300, 3)
    val tok0 = GraftLog.currentVersion(dir)
    GraftLog.deleteVectors(dir, Seq(10L, 20L, 30L))
    val tok1 = GraftLog.currentVersion(dir)
    def gen(t: String): Long =
      """g(\d+)\.""".r.findFirstMatchIn(t).get.group(1).toLong
    assert(gen(tok1) === gen(tok0) + 1,
      "a dv commit bumps the generation (it changes visible rows)")
    // the pre-delete token still reads the suppressed rows
    assert(ids(dir, Some(tok0)) === (0L until 300L))
    // the post-delete token (and the head) read without them
    assert(ids(dir, Some(tok1)) ===
      (0L until 300L).filterNot(Seq(10L, 20L, 30L).contains))
    // the metadata-aggregate fast path over the OLD token still
    // serves sidecar counts (its shard set is dv-free at its
    // generation)
    val r = spark.read.format(fmt).option("version", tok0).load(dir)
      .agg(count(lit(1)), min($"event_id"), max($"event_id"))
      .as[(Long, Long, Long)].head()
    assert(r === ((300L, 0L, 299L)))
  }

  test("vectors are cumulative; a reader needs only the latest") {
    val dir = freshLog(200, 2)
    GraftLog.deleteVectors(dir, Seq(5L))
    GraftLog.deleteVectors(dir, Seq(6L, 105L))
    assert(ids(dir) === (0L until 200L).filterNot(Seq(5L, 6L, 105L).contains))
    // shard 0 carries two dv generations; the LATEST holds the union
    val dvs = liveDvFiles(dir).filter(_.startsWith("shard-00000"))
    assert(dvs.size === 2, s"two dv commits touched shard 0: $dvs")
    val latest = dvs.maxBy { n =>
      """\.g(\d+)\.dv""".r.findFirstMatchIn(n).get.group(1).toLong }
    assert(GraftLog.dvKeys(s"$dir/_dv/$latest").toSeq === Seq(5L, 6L))
  }

  test("SQL DELETE … IN routes to deletion vectors; a range keeps CoW") {
    val base = tmpDir("glog-dv-cat").toString
    spark.conf.set("spark.sql.catalog.glogdv",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogdv.base", base)
    val dir = s"$base/t"
    feed(0, 300).write.format(fmt).mode("append")
      .option("shards", 3).save(dir)
    val before = shardListing(dir)
    val rw0 = GraftLog.shardsRewritten.get()
    spark.sql("DELETE FROM glogdv.t WHERE event_id IN (7, 8, 113)")
    assert(shardListing(dir) === before, "IN-list delete wrote no shard")
    assert(GraftLog.shardsRewritten.get() === rw0)
    assert(liveDvFiles(dir).nonEmpty)
    assert(spark.sql("SELECT count(*) FROM glogdv.t").as[Long].head()
      === 297L)
    // a RANGE delete still takes the sidecar-drop/CoW path (here:
    // shard 0 = ids [0,100) is fully covered → dropped by stats)
    val dropped0 = GraftLog.shardsDropped.get()
    spark.sql("DELETE FROM glogdv.t WHERE event_id < 100")
    assert(GraftLog.shardsDropped.get() === dropped0 + 1)
    // 297 visible − 98 visible under id<100 (7 and 8 were dv-deleted)
    assert(spark.sql("SELECT count(*) FROM glogdv.t").as[Long].head()
      === 199L)
  }

  test("a range-delete rewrite does not resurrect dv-suppressed rows") {
    val dir = freshLog(300, 3)
    // suppress id 5 (shard 0 = [0,100)) via dv, then range-delete
    // [50, 149] — shard 0 partially overlaps and is REWRITTEN
    GraftLog.deleteVectors(dir, Seq(5L))
    val rw0 = GraftLog.shardsRewritten.get()
    GraftLog.deleteWhere(dir, 50L, 149L)
    assert(GraftLog.shardsRewritten.get() > rw0, "boundary shard rewrote")
    val got = ids(dir)
    assert(!got.contains(5L), "the rewrite must re-apply the vector")
    assert(got === (0L until 300L)
      .filterNot(i => i == 5L || (i >= 50L && i <= 149L)))
    // the old vector retired with the old content: live _dv holds
    // nothing for the rewritten shard name
    assert(!liveDvFiles(dir).exists(_.startsWith("shard-00000")),
      s"rewritten shard's vectors must retire: ${liveDvFiles(dir)}")
  }

  test("count-priced pushdowns self-disable and stay value-exact") {
    val dir = freshLog(400, 4)
    GraftLog.deleteVectors(dir, (0L until 400L by 7).toSeq)
    val visible = (0L until 400L).filterNot(_ % 7 == 0)
    val df = spark.read.format(fmt).load(dir)
    // aggregate: must NOT serve physical sidecar counts
    assert(df.agg(count(lit(1))).as[Long].head() === visible.size.toLong)
    assert(df.agg(min($"event_id")).as[Long].head() === 1L)
    // LIMIT: asking for exactly the visible count must deliver it
    // (a sidecar-priced shard selection would under-read)
    assert(df.limit(visible.size).count() === visible.size.toLong)
    // top-n over the sorted layout skips suppressed ids
    assert(df.orderBy($"event_id").limit(3).select($"event_id")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    assert(df.orderBy($"event_id".desc).limit(3).select($"event_id")
      .as[Long].collect().toSeq.sorted === Seq(396L, 397L, 398L))
  }

  test("the change feed emits a dv-only commit as its delete delta") {
    val dir = freshLog(300, 3)
    val tok0 = GraftLog.currentVersion(dir)
    GraftLog.deleteVectors(dir, Seq(11L, 210L))
    val tok1 = GraftLog.currentVersion(dir)
    GraftLog.deleteVectors(dir, Seq(12L))
    val tok2 = GraftLog.currentVersion(dir)
    def cdf(a: String, b: String): Seq[(Long, String)] =
      spark.read.format(fmt).option("readChangeFeed", "true")
        .option("sinceVersion", a).option("version", b).load(dir)
        .select($"event_id", $"_change_type")
        .as[(Long, String)].collect().sorted.toSeq
    assert(cdf(tok0, tok1) ===
      Seq((11L, "delete"), (210L, "delete")),
      "first dv commit's delta: exactly its newly-suppressed rows")
    assert(cdf(tok1, tok2) === Seq((12L, "delete")),
      "second delta excludes the FIRST commit's keys (cumulative dv " +
        "minus the since-snapshot's dv)")
    assert(cdf(tok0, tok2) ===
      Seq((11L, "delete"), (12L, "delete"), (210L, "delete")))
    // and the feed reconciles with the snapshot diff
    val snapA = spark.read.format(fmt).option("version", tok0).load(dir)
    val snapB = spark.read.format(fmt).option("version", tok2).load(dir)
    assert(snapA.except(snapB).select($"event_id").as[Long]
      .collect().sorted.toSeq === Seq(11L, 12L, 210L))
  }

  test("compaction physically purges vectors; history keeps them") {
    val dir = freshLog(300, 3)
    GraftLog.deleteVectors(dir, Seq(33L, 133L, 233L))
    val tokDv = GraftLog.currentVersion(dir)
    val visible = (0L until 300L).filterNot(Seq(33L, 133L, 233L).contains)
    GraftLog.compact(spark, dir, 2)
    assert(ids(dir) === visible, "compacted rows == dv-visible rows")
    assert(liveDvFiles(dir).isEmpty,
      "vectors retired with the shards they described")
    // the physical purge restores the metadata-aggregate fast path
    val opened0 = GraftLog.filesOpened.get()
    assert(spark.read.format(fmt).load(dir).agg(count(lit(1)))
      .as[Long].head() === visible.size.toLong)
    assert(GraftLog.filesOpened.get() === opened0,
      "post-compact count must be sidecar-served (zero shards opened)")
    // the pre-compact (post-dv) token still resolves, still suppressed
    assert(ids(dir, Some(tokDv)) === visible)
    // … and its retired store co-locates shard copies with their dvs
    val retired = Paths.get(dir, "_retired")
    val dvInRetired = Files.walk(retired)
    val found = try dvInRetired.iterator().asScala
      .exists(_.getFileName.toString.endsWith(".dv")) finally dvInRetired.close()
    assert(found, "retired store holds the vectors for historical reads")
  }

  test("truncate + byte-identical re-ingest meets no leftover vector") {
    val dir = freshLog(200, 2)
    GraftLog.deleteVectors(dir, Seq(42L))
    assert(ids(dir).size === 199)
    GraftLog.deleteWhere(dir, Long.MinValue, Long.MaxValue) // truncate
    assert(ids(dir).isEmpty)
    // byte-identical content re-ingested; whether or not shard names
    // are reused (index claims persist), the retired table's vectors
    // moved out of live `_dv/` with their shards and must not apply
    feed(0, 200).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    assert(ids(dir) === (0L until 200L),
      "re-ingested rows must not inherit a retired shard's vector")
    assert(liveDvFiles(dir).isEmpty,
      "live _dv holds vectors only for live shard files")
  }

  test("deleteVectors refuses a sidecar-less shard loudly") {
    val dir = freshLog(100, 1)
    // simulate a writer that crashed between shard rename and sidecar
    Files.delete(Paths.get(dir, "shard-00000.meta"))
    val e = intercept[IllegalStateException] {
      GraftLog.deleteVectors(dir, Seq(5L))
    }
    assert(e.getMessage.contains("glog.analyze"),
      "the error must point at the sidecar-rebuild procedure")
    assert(liveDvFiles(dir).isEmpty, "no unusable blank-echo vector")
  }

  test("the plain stream fails loudly on vectors unless ignoreDeletes") {
    val dir = freshLog(200, 2)
    GraftLog.deleteVectors(dir, Seq(7L))
    def drain(ignore: Boolean): Seq[Long] = {
      val r = spark.readStream.format(fmt)
      if (ignore) r.option("ignoreDeletes", "true")
      val q = r.load(dir).writeStream.format("memory")
        .queryName(s"dvstream$ignore")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmpDir("dv-cp").toString)
        .start()
      q.awaitTermination(60000)
      spark.table(s"dvstream$ignore").select($"event_id")
        .as[Long].collect().sorted.toSeq
    }
    // replay determinism: a shard-offset stream cannot apply
    // retroactive deletes — it must refuse (the Delta rule) …
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(ignore = false)
    }
    assert(e.getCause.getMessage.contains("readChangeFeed"))
    // … or stream the PHYSICAL append log when explicitly asked
    assert(drain(ignore = true) === (0L until 200L),
      "ignoreDeletes streams physical rows (replay-stable)")
  }

  test("an echo-stale vector is inert") {
    val dir = freshLog(100, 1)
    // hand-write a vector with a wrong echo at the current generation
    Files.createDirectories(Paths.get(dir, "_dv"))
    Files.write(Paths.get(dir, "_dv", "shard-00000.graftlog.g0.dv"),
      "9|9|9|9\n17\n".getBytes("UTF-8"))
    assert(ids(dir) === (0L until 100L),
      "a vector whose echo mismatches the serving file never applies")
  }

  test("CALL glog.dv_stats reports per-shard suppression, fraction, " +
      "bytes and dense-threshold headroom — pure metadata") {
    val base = tmpDir("glog-dvstats").toString
    spark.conf.set("spark.sql.catalog.glogdvs",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogdvs.base", base)
    val dir = s"$base/t"
    feed(0, 300).write.format(fmt).mode("append")
      .option("shards", 3).save(dir)
    def stats() = spark.sql("CALL glogdvs.dv_stats(table => 't')")
      .as[(String, Long, Long, Double, Long, Double)].collect()
      .toSeq.sortBy(_._1)
    // clean table: zero suppression everywhere, full headroom
    val s0 = stats()
    assert(s0.size === 3 &&
      s0.forall(t => t._2 === 100L && t._3 === 0L && t._4 === 0.0 &&
        t._5 === 0L && t._6 === 0.5))
    GraftLog.deleteVectors(dir, Seq(5L, 6L, 105L))
    GraftLog.filesOpened.set(0)
    val s1 = stats()
    assert(GraftLog.filesOpened.get() === 0,
      "dv_stats reads NO row data — sidecar/dv listings only")
    assert(s1.map(_._3) === Seq(2L, 1L, 0L),
      "per-shard suppressed key counts are exact")
    assert(s1.map(t => math.round(t._4 * 100)) === Seq(2L, 1L, 0L))
    assert(s1.forall(t => math.abs(t._6 - (0.5 - t._4)) < 1e-12))
    assert(s1.count(_._5 > 0L) === 2, "dv bytes track the sidecars")
    // phys_rows is the PHYSICAL sidecar count (suppressed included)
    assert(s1.map(_._2).sum === 300L)
  }
}
