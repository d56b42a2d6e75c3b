package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Z-order clustering (`GraftLog.clusterZ` / `CALL glog.cluster`):
  * re-sharding by Morton value gives every shard a tight bounding box
  * in BOTH event_id and the second dimension, so a secondary range
  * index on that dimension prunes sharply — the multi-dimensional
  * layout optimization (Delta OPTIMIZE ZORDER / Iceberg zorder) on
  * this format. Pins: row preservation (bit-exact), the pruning
  * payoff (opened-shard counts before/after), the documented trades
  * (event_id top-n self-disables on overlapping ranges yet stays
  * correct), snapshot retention across the rewrite, deletion-vector
  * purge through the dv-aware rewrite read, and the SQL procedure
  * surface. */
class ZOrderClusterSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  /** event_id = id, user_id = id % 64: every contiguous-id shard of
    * the ingest layout holds EVERY user_id value — the layout where a
    * user_id range index is useless until the table is re-clustered. */
  private def feed(n: Int) = spark.range(0, n)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 64).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  private def freshLog(n: Int, shards: Int): String = {
    val dir = tmpDir("glog-zo").toString
    feed(n).write.format(fmt).mode("append")
      .option("shards", shards).save(dir)
    dir
  }

  private def ids(dir: String): Seq[Long] =
    spark.read.format(fmt).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq

  test("clusterZ preserves rows bit-exactly and re-shards atomically") {
    val dir = freshLog(3200, 8)
    val before = spark.read.format(fmt).load(dir)
      .as[(Long, java.time.LocalDateTime, Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    val (b, a) = GraftLog.clusterZ(spark, dir, 8)
    assert(b === 8 && a === 8)
    val after = spark.read.format(fmt).load(dir)
      .as[(Long, java.time.LocalDateTime, Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(after === before, "clustering is a pure layout change")
    // within-shard event_id order survives (the format contract):
    // ORDER BY event_id with no explicit sort above a single shard
    // relies on it
    GraftLog.listShards(dir).foreach { si =>
      val shardIds = Files.readAllLines(Paths.get(si.file)).asScala
        .filter(_.nonEmpty)
        .map(l => l.substring(0, l.indexOf('|')).toLong)
      assert(shardIds == shardIds.sorted,
        s"${si.file} must stay event_id-sorted internally")
    }
  }

  test("a dim range index prunes sharply after clustering, not before") {
    val dir = freshLog(6400, 16)
    def banded(): Long = {
      val a = GraftLog.filesOpened.get()
      val n = spark.read.format(fmt).load(dir)
        .filter($"user_id" >= 0 && $"user_id" <= 7).count()
      assert(n === 800L, "an eighth of the 64-value domain")
      GraftLog.filesOpened.get() - a
    }
    // ingest layout: every shard holds every user_id → index prunes 0
    GraftLog.buildIndex(spark, dir, "user_id", "range")
    val openedBefore = banded()
    assert(openedBefore === 16L, "id-clustered layout cannot prune on dim")
    GraftLog.clusterZ(spark, dir, 16)
    GraftLog.buildIndex(spark, dir, "user_id", "range") // echoes changed
    val openedAfter = banded()
    assert(openedAfter <= 8L,
      s"z-clustered layout must halve (at least) the banded read: " +
        s"$openedBefore -> $openedAfter")
  }

  test("event_id top-n self-disables on overlapping ranges, stays correct") {
    val dir = freshLog(1600, 8)
    GraftLog.clusterZ(spark, dir, 8)
    // ranges now overlap → the scan's disjointness check refuses
    // shard selection; Spark's TakeOrdered above it keeps semantics
    val top = spark.read.format(fmt).load(dir)
      .orderBy($"event_id").limit(5).select($"event_id")
      .as[Long].collect().toSeq
    assert(top === Seq(0L, 1L, 2L, 3L, 4L))
    val bottom = spark.read.format(fmt).load(dir)
      .orderBy($"event_id".desc).limit(5).select($"event_id")
      .as[Long].collect().toSeq.sorted
    assert(bottom === Seq(1595L, 1596L, 1597L, 1598L, 1599L))
  }

  test("a pre-cluster snapshot token still reads; vectors purge through") {
    val dir = freshLog(800, 4)
    GraftLog.deleteVectors(dir, Seq(13L, 500L))
    val tok = GraftLog.currentVersion(dir)
    GraftLog.clusterZ(spark, dir, 4)
    // the rewrite read through the dv-aware scan: suppressed rows are
    // physically gone and the vectors retired with their old shards
    assert(ids(dir) === (0L until 800L).filterNot(Seq(13L, 500L).contains))
    val dvd = Paths.get(dir, "_dv")
    val liveDvs = if (!Files.isDirectory(dvd)) 0
      else { val s = Files.list(dvd)
        try s.iterator().asScala.size finally s.close() }
    assert(liveDvs === 0, "vectors retired with the shards they described")
    // retention: the pre-cluster (post-dv) token reads its exact rows
    val old = spark.read.format(fmt).option("version", tok).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(old === (0L until 800L).filterNot(Seq(13L, 500L).contains))
  }

  test("CALL glog.cluster runs the rewrite from SQL") {
    val base = tmpDir("glog-zo-cat").toString
    spark.conf.set("spark.sql.catalog.glogzo",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogzo.base", base)
    feed(800).write.format(fmt).mode("append")
      .option("shards", 4).save(s"$base/t")
    val r = spark.sql(
      "CALL glogzo.cluster(table => 't', shards => 4, dim => 'user_id')")
      .as[(Int, Int)].head()
    assert(r === ((4, 4)))
    assert(spark.sql("SELECT count(*) FROM glogzo.t").as[Long].head()
      === 800L)
    val listed = spark.sql("SHOW PROCEDURES IN glogzo")
      .select("procedure_name").as[String].collect().toSet
    assert(listed.contains("cluster"))
  }

  test("a non-numeric dim fails actionably and leaves no staging dir") {
    val dir = freshLog(200, 2)
    val before = GraftLog.listShards(dir).map(_.file).sorted
    val e = intercept[IllegalArgumentException] {
      GraftLog.clusterZ(spark, dir, 2, dim = "event_type")
    }
    assert(e.getMessage.contains("not numeric"),
      "string dim → clear error, not an opaque NPE")
    assert(!Files.exists(Paths.get(dir + "__cluster_tmp")),
      "the failed run staged nothing on disk")
    assert(GraftLog.listShards(dir).map(_.file).sorted === before,
      "the table is untouched")
  }
}
