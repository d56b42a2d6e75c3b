package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** TIMESTAMP AS OF — wall-clock time travel over the graftlog commit
  * markers (`_commits/<ts_ms>-<token>`, one per completed commit):
  * an instant resolves to the newest snapshot at-or-before it, reads
  * run on the exact-version machinery, and every boundary case fails
  * LOUDLY — an instant predating the table, a table with no commit
  * record, and an instant whose resolved generation VACUUM has
  * reclaimed.
  */
class GraftLogTimestampSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  /** Wall-clock instant strictly between the last and next commit
    * (markers have ms resolution — separate them). */
  private def instant(): Long = {
    Thread.sleep(5); val t = System.currentTimeMillis(); Thread.sleep(5); t
  }

  test("an instant between commits resolves to the earlier snapshot") {
    val dir = tmpDir("glog-ts").toString
    feed(0, 300).write.format(fmt).mode("append")
      .option("shards", 3).save(dir)
    val t1 = instant()
    feed(300, 600).write.format(fmt).mode("append")
      .option("shards", 3).save(dir)
    val t2 = instant()
    assert(GraftLog.timestampAsOf(dir, t1) === "g0.3")
    assert(GraftLog.timestampAsOf(dir, t2) === "g0.6")
    val old = spark.read.format(fmt)
      .option("timestampAsOf", t1.toString).load(dir)
    assert(old.count() === 300L)
    assert(old.agg(max($"event_id")).as[Long].head() === 299L)
    // at-or-after the head commit: the current state
    assert(spark.read.format(fmt)
      .option("timestampAsOf", t2.toString).load(dir).count() === 600L)
  }

  test("an instant predating the table fails loudly; so does a table " +
      "with no commit record") {
    val dir = tmpDir("glog-ts").toString
    val before = instant()
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    val e = intercept[IllegalArgumentException] {
      GraftLog.timestampAsOf(dir, before)
    }
    assert(e.getMessage.contains("predates"), e.getMessage)
    // a pre-r12 table (no _commits markers): loud, with a pointer to
    // version tokens
    val legacy = tmpDir("glog-ts-legacy").toString
    feed(0, 50).write.format(fmt).mode("append")
      .option("shards", 1).save(legacy)
    val cd = java.nio.file.Paths.get(legacy, "_commits")
    val w = java.nio.file.Files.walk(cd)
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.delete(f))
    finally w.close()
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format(fmt)
        .option("timestampAsOf", System.currentTimeMillis().toString)
        .load(legacy).count()
    }
    assert(e2.getMessage.contains("no commit timestamps"), e2.getMessage)
  }

  test("a pre-rewrite instant reads the pre-rewrite rows across the " +
      "boundary; after VACUUM it fails loudly while later instants read") {
    val dir = tmpDir("glog-ts").toString
    feed(0, 400).write.format(fmt).mode("append")
      .option("shards", 4).save(dir)
    val tPre = instant()
    GraftLog.deleteWhere(dir, 0L, 99L) // structural rewrite, bumps gen
    val tPost = instant()
    // wall-clock reads straddling the rewrite: exact as-of semantics
    assert(spark.read.format(fmt)
      .option("timestampAsOf", tPre.toString).load(dir).count() === 400L)
    assert(spark.read.format(fmt)
      .option("timestampAsOf", tPost.toString).load(dir).count() === 300L)
    val (files, _) = GraftLog.vacuum(dir)
    assert(files > 0L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format(fmt)
        .option("timestampAsOf", tPre.toString).load(dir).count()
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    assert(spark.read.format(fmt)
      .option("timestampAsOf", tPost.toString).load(dir).count() === 300L)
  }

  test("SQL TIMESTAMP AS OF resolves through the catalog") {
    val dir = tmpDir("glog-ts").toString
    feed(0, 200).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    val t1 = instant()
    feed(200, 400).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    val base = java.nio.file.Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogts",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogts.base", base)
    val tbl = s"glogts.`${java.nio.file.Paths.get(dir).getFileName}`"
    val lit1 = java.time.Instant.ofEpochMilli(t1)
      .atZone(java.time.ZoneId.systemDefault()).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
      s"SELECT count(*) FROM $tbl TIMESTAMP AS OF '$lit1'")
      .as[Long].head() === 200L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() === 400L)
  }
}
