package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** set_retention + analyze — the procedure-surface completion (r12
  * brief #7): a stored `_retention` policy becomes vacuum's DEFAULT
  * (explicit knobs still override), travels with shallow clones, and
  * `analyze` rebuilds missing sidecars so pruning and the
  * metadata-aggregate fast path recover after a crashed writer.
  */
class RetentionPolicySpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  test("vacuum sweeps ABANDONED staging dirs (age-gated) and spares " +
      "recent ones") {
    val dir = tmpDir("glog-pol-sweep").toString
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    val parent = java.nio.file.Paths.get(dir).getParent
    val name = java.nio.file.Paths.get(dir).getFileName.toString
    val old = parent.resolve(s"${name}__compact_tmp-dead1234")
    java.nio.file.Files.createDirectories(old)
    java.nio.file.Files.write(old.resolve("leak.tmp"),
      "x".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(old,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 90000000L)) // 25 h ago: abandoned
    val fresh = parent.resolve(s"${name}__cluster_tmp-live5678")
    java.nio.file.Files.createDirectories(fresh) // now: a live racer
    // an UNRELATED sibling table that merely shares the name prefix
    // (e.g. 'events__archive' next to 'events') must NEVER be swept,
    // however old: the sweep matches exact staging shapes only
    val sibling = parent.resolve(s"${name}__archive")
    feed(500, 600).write.format(fmt).mode("append")
      .option("shards", 1).save(sibling.toString)
    java.nio.file.Files.setLastModifiedTime(sibling,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 90000000L))
    // a bare-stem dir matching a staging prefix but with NO uuid
    // suffix is not a graft staging dir either — spared
    val bareStem = parent.resolve(s"${name}__compact_tmp-")
    java.nio.file.Files.createDirectories(bareStem)
    java.nio.file.Files.setLastModifiedTime(bareStem,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 90000000L))
    GraftLog.vacuum(dir, retainGenerations = 100)
    assert(!java.nio.file.Files.exists(old),
      "a crashed run's staging dir is reclaimed")
    assert(java.nio.file.Files.exists(fresh),
      "a concurrent op's staging dir is untouched (age gate)")
    assert(java.nio.file.Files.exists(sibling) &&
      spark.read.format(fmt).load(sibling.toString).count() === 100L,
      "an unrelated prefix-sharing sibling TABLE survives vacuum intact")
    assert(java.nio.file.Files.exists(bareStem),
      "a suffix-less near-miss dir is not treated as staging")
    java.nio.file.Files.delete(fresh)
    java.nio.file.Files.delete(bareStem)
    assert(spark.read.format(fmt).load(dir).count() === 100L)
  }

  test("vacuum reclaims crashed-task stage tmps (age-gated) and " +
      "orphan index files of vanished columns") {
    val dir = tmpDir("glog-pol-tmps").toString
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    val old = java.time.Instant.now().minusSeconds(90000)
    // a SIGKILLed merge task's litter: spill run + row tmp + dv stage
    Seq(".shard-00042-7.run3.tmp", ".shard-00042-7.tmp",
        ".dvstage-00042-7.tmp").foreach { n =>
      val p = Paths.get(dir, n)
      Files.write(p, "999|1|1|x|0.5\n".getBytes("UTF-8"))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.from(old))
    }
    // a LIVE stage tmp (fresh mtime) must survive
    Files.write(Paths.get(dir, ".shard-00043-9.tmp"),
      "1000|1|1|x|0.5\n".getBytes("UTF-8"))
    // index files of a column that no longer exists (a DDL raced
    // per-epoch maintenance): inert but permanent without the sweep
    Files.createDirectories(Paths.get(dir, "_index"))
    Files.write(
      Paths.get(dir, "_index", "shard-00000.graftlog.ghost.range"),
      "range|0|9|junk".getBytes("UTF-8"))
    Files.write(
      Paths.get(dir, "_index", "shard-00000.graftlog.ts.range"),
      "range|0|9|junk".getBytes("UTF-8")) // ts EXISTS: kept
    GraftLog.vacuum(dir, retainGenerations = 100)
    assert(!Files.exists(Paths.get(dir, ".shard-00042-7.run3.tmp")) &&
      !Files.exists(Paths.get(dir, ".shard-00042-7.tmp")) &&
      !Files.exists(Paths.get(dir, ".dvstage-00042-7.tmp")),
      "abandoned stage litter reclaimed")
    assert(Files.exists(Paths.get(dir, ".shard-00043-9.tmp")),
      "a live (fresh) stage tmp is never touched")
    assert(!Files.exists(
      Paths.get(dir, "_index", "shard-00000.graftlog.ghost.range")),
      "orphan-column index files die with vacuum")
    assert(Files.exists(
      Paths.get(dir, "_index", "shard-00000.graftlog.ts.range")),
      "live-column index files survive (even if echo-stale)")
    Files.delete(Paths.get(dir, ".shard-00043-9.tmp"))
    assert(spark.read.format(fmt).load(dir).count() === 100L)
  }

  test("a stored policy drives argument-less vacuum; explicit knobs " +
      "override; the policy clones with the table") {
    val dir = tmpDir("glog-pol").toString
    feed(0, 400).write.format(fmt).mode("append")
      .option("shards", 4).save(dir)
    val tok0 = GraftLog.currentVersion(dir)
    GraftLog.setRetention(dir, retainGenerations = 1, minAgeMs = 0L)
    assert(GraftLog.retentionPolicy(dir) === ((1, 0L)))
    GraftLog.deleteWhere(dir, 0L, 99L) // g0 → g1
    // policy retains 1 generation: plain vacuum must NOT reclaim g0
    GraftLog.vacuum(dir)
    assert(spark.read.format(fmt).option("version", tok0).load(dir)
      .count() === 400L, "retained window must stay readable")
    // the policy travels with a shallow clone
    val clone = tmpDir("glog-pol-clone").toString + "/c"
    GraftLog.shallowClone(dir, clone)
    assert(GraftLog.retentionPolicy(clone) === ((1, 0L)))
    // explicit knobs override the stored policy
    GraftLog.vacuum(dir, retainGenerations = 0, minAgeMs = 0L)
    intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("version", tok0).load(dir).count()
    }
  }

  test("CALL glog.describe: one-row metadata summary, zero row reads") {
    val dir = tmpDir("glog-desc").toString
    feed(0, 200).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    GraftLog.addColumn(dir, "w",
      org.apache.spark.sql.types.LongType, Some("1"))
    GraftLog.addColumn(dir, "x",
      org.apache.spark.sql.types.StringType, None)
    GraftLog.dropColumn(dir, "x")
    GraftLog.addConstraint(spark, dir, "v_pos", "value >= 0")
    GraftLog.buildIndex(spark, dir, "user_id", "bloom")
    GraftLog.deleteVectors(dir, Seq(7L))
    GraftLog.setRetention(dir, retainGenerations = 3, minAgeMs = 100L)
    val base = Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogdsc",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogdsc.base", base)
    GraftLog.filesOpened.set(0)
    val r = spark.sql(s"CALL glogdsc.describe(table => " +
        s"'${Paths.get(dir).getFileName}')")
      .as[(Long, Int, Long, Long, Long, Int, Int, Int, Int, Int,
        Long, Boolean)].head()
    assert(GraftLog.filesOpened.get() === 0, "listings only")
    assert(r._2 === 2 && r._3 === 200L && r._4 > 0L)
    assert(r._5 === 1L, "one dv file")
    assert(r._6 === 1 && r._7 === 1, "one live evolved col, one tombstone")
    assert(r._8 === 1 && r._9 === 1)
    assert(r._10 === 3 && r._11 === 100L && !r._12)
    // n_rows refuses to lie: strip a sidecar, describe reports -1
    Files.delete(Paths.get(dir, "shard-00000.meta"))
    val r2 = spark.sql(s"CALL glogdsc.describe(table => " +
        s"'${Paths.get(dir).getFileName}')")
      .select("n_rows").as[Long].head()
    assert(r2 === -1L, "missing sidecar => unknown, not wrong")
  }

  test("SQL: set_retention persists, vacuum() honors it, analyze " +
      "rebuilds a lost sidecar") {
    val dir = tmpDir("glog-pol").toString
    feed(0, 300).write.format(fmt).mode("append")
      .option("shards", 3).save(dir)
    val base = Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogr",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogr.base", base)
    val tbl = s"glogr.`${Paths.get(dir).getFileName}`"
    val name = Paths.get(dir).getFileName.toString
    assert(spark.sql(
      s"CALL glogr.set_retention(table => '$name', " +
        "retain_generations => 1)").as[(Int, Long)].head() === ((1, 0L)))
    val tok0 = GraftLog.currentVersion(dir)
    spark.sql(s"DELETE FROM $tbl WHERE event_id < 50")
    spark.sql(s"CALL glogr.vacuum(table => '$name')").collect()
    assert(spark.read.format(fmt).option("version", tok0).load(dir)
      .count() === 300L, "SQL vacuum must honor the stored policy")
    // lose a sidecar (crashed-writer shape): aggregates must refuse
    // the metadata path but stay correct; analyze restores it
    val meta = Files.list(Paths.get(dir)).iterator()
    val lost = {
      var f: java.nio.file.Path = null
      while (meta.hasNext) {
        val p = meta.next()
        if (p.toString.endsWith(".meta") && f == null) f = p
      }
      f
    }
    Files.delete(lost)
    val (listed, rebuilt) = spark.sql(
      s"CALL glogr.analyze(table => '$name')").as[(Int, Int)].head()
    assert(rebuilt === 1, s"one sidecar rebuilt (of $listed listed)")
    val si = GraftLog.listShards(dir)
    assert(si.forall(_.stats.isDefined), "all sidecars present again")
    // rebuilt stats are the real content stats: sidecar rows sum to
    // the table count
    assert(si.flatMap(_.stats).map(_._3).sum ===
      spark.read.format(fmt).load(dir).count())
  }
}
