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
    val parent = Paths.get(dir).getParent
    val leftover = Files.list(parent).iterator().asScala
      .map(_.getFileName.toString)
      .exists(_.startsWith(Paths.get(dir).getFileName.toString +
        "__cluster_tmp"))
    assert(!leftover, "the failed run staged nothing on disk")
    assert(GraftLog.listShards(dir).map(_.file).sorted === before,
      "the table is untouched")
  }

  /** id-clustered feed carrying an EVOLVED long column `region`
    * (id % 16) besides user_id (id % 64) — two indexable dims whose
    * values spread across every shard of the ingest layout. */
  private def freshLog3(n: Int, shards: Int): String = {
    val dir = tmpDir("glog-zo3").toString
    spark.range(0, 1).select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      lit(0L).as("user_id"), lit("seed").as("event_type"),
      lit(0.0).as("value"))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    GraftLog.addColumn(dir, "region",
      org.apache.spark.sql.types.LongType)
    spark.sql(s"DELETE FROM ${cat3(dir)} WHERE event_id = 0")
    spark.range(0, n).select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 64).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"),
      ($"id" % 16).as("region"))
      .write.format(fmt).mode("append").option("shards", shards)
      .save(dir)
    dir
  }

  private def cat3(dir: String): String = {
    val base = Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogzo3",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogzo3.base", base)
    s"glogzo3.`${Paths.get(dir).getFileName}`"
  }

  test("3-dim clustering: range indexes on BOTH extra dims prune") {
    val dir = freshLog3(1600, 16)
    val pre = spark.read.format(fmt).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq
    val (b, a) = GraftLog.clusterZDims(spark, dir, 16,
      Seq("user_id", "region"))
    assert(b === 16 && a === 16)
    assert(spark.read.format(fmt).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq === pre,
      "rows bit-exact across the 3-dim rewrite")
    GraftLog.buildIndex(spark, dir, "user_id", "range")
    GraftLog.buildIndex(spark, dir, "region", "range")
    // a 1/8 user_id band opens a fraction of the shards
    GraftLog.filesOpened.set(0)
    val u = spark.read.format(fmt).load(dir)
      .filter($"user_id" >= 0L && $"user_id" < 8L).count()
    val openedU = GraftLog.filesOpened.get()
    assert(u === 1600L / 64 * 8)
    assert(openedU < 16, s"user_id band should prune, opened $openedU")
    // a 1/8 region band prunes too — the THIRD dimension also has
    // tight per-shard boxes
    GraftLog.filesOpened.set(0)
    val r = spark.read.format(fmt).load(dir)
      .filter($"region" >= 0L && $"region" < 2L).count()
    val openedR = GraftLog.filesOpened.get()
    assert(r === 1600L / 16 * 2)
    assert(openedR < 16, s"region band should prune, opened $openedR")
  }

  test("incremental clustering folds ONLY fresh shards; settled stay") {
    val dir = freshLog(1600, 16)
    GraftLog.clusterZDims(spark, dir, 8, Seq("user_id"))
    val settled = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    // append 2 unclustered shards
    feed(200).withColumn("event_id", $"event_id" + 1600L)
      .write.format(fmt).mode("append").option("shards", 2).save(dir)
    val (folded, written) = GraftLog.clusterZIncremental(spark, dir)
    assert(folded === 2, "exactly the fresh shards folded")
    assert(written >= 1)
    val after = GraftLog.listShards(dir)
      .map(s => (s.file, s.bytes)).sortBy(_._1)
    assert(settled.forall(after.contains),
      "every settled clustered shard byte-untouched")
    assert(spark.read.format(fmt).load(dir).count() === 1800L)
    assert(spark.read.format(fmt).load(dir)
      .select($"event_id").distinct().count() === 1800L)
    // nothing left to do
    assert(GraftLog.clusterZIncremental(spark, dir) === ((0, 0)))
    // no staging litter
    val parent = Paths.get(dir).getParent
    val l = Files.list(parent)
    try assert(!l.iterator().asScala.map(_.getFileName.toString)
      .exists(n => n.contains("__zinc_") || n.contains("__cluster_tmp")))
    finally l.close()
  }

  test("incremental clustering respects deletion vectors of fresh shards") {
    val dir = freshLog(800, 8)
    GraftLog.clusterZDims(spark, dir, 4, Seq("user_id"))
    feed(100).withColumn("event_id", $"event_id" + 800L)
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    // suppress 3 rows of the FRESH shard via a dv, then fold it in
    GraftLog.deleteVectors(dir, Seq(810L, 811L, 812L))
    val (folded, _) = GraftLog.clusterZIncremental(spark, dir)
    assert(folded === 1)
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 897L, "suppressed rows stay suppressed")
    assert(cur.filter($"event_id".isin(810L, 811L, 812L)).count() === 0L)
    // incremental without clustering state refuses loudly
    val virgin = freshLog(100, 1)
    intercept[IllegalArgumentException] {
      GraftLog.clusterZIncremental(spark, virgin)
    }
  }

  test("CALL glog.cluster: dims CSV and incremental => true") {
    val dir = freshLog(800, 8)
    cat3(dir) // point the catalog at this dir's parent
    val tbl = s"'${Paths.get(dir).getFileName}'"
    val r = spark.sql(
      s"CALL glogzo3.cluster(table => $tbl, shards => 4, " +
        "dim => 'user_id,value')").as[(Int, Int)].head()
    assert(r === ((8, 4)))
    feed(100).withColumn("event_id", $"event_id" + 800L)
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val inc = spark.sql(
      s"CALL glogzo3.cluster(table => $tbl, shards => 0, " +
        "incremental => true)").as[(Int, Int)].head()
    assert(inc._1 === 1, "one fresh shard folded")
    assert(spark.read.format(fmt).load(dir).count() === 900L)
  }
}
