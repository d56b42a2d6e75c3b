package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Graftlog snapshot lifecycle: a token minted by
  * `GraftLog.currentVersion` keeps reading the SAME rows after later
  * appends (the shard-prefix invariant) AND after structural rewrites
  * (r11 retention: pinned history listings + the retired shard
  * store); only an explicit VACUUM past the retention window makes a
  * token fail — LOUDLY, never by silently serving rows the snapshot
  * did not hold. Also covers zero-copy shallow clones and the SQL
  * CALL maintenance/history procedures.
  */
class GraftLogVersionSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  /** Fresh 2-commit table: events ids [0,n) in `shards` shards, then
    * ids [n, 2n) appended. Returns (dir, token-after-first-commit). */
  private def twoCommits(n: Int, shards: Int): (String, String) = {
    val dir = tmpDir("glog-ver").toString
    def feed(lo: Int, hi: Int) = spark.range(lo, hi)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
        ($"id" % 7).as("user_id"), lit("click").as("event_type"),
        ($"id" % 100).cast("double").as("value"))
    feed(0, n).write.format(fmt).mode("append")
      .option("shards", shards).save(dir)
    val tok = GraftLog.currentVersion(dir)
    feed(n, 2 * n).write.format(fmt).mode("append")
      .option("shards", shards).save(dir)
    (dir, tok)
  }

  test("a snapshot token still reads the pre-append rows after appends") {
    val (dir, tok) = twoCommits(400, 4)
    assert(tok === "g0.4", s"append-only table must stay generation 0: $tok")
    val old = spark.read.format(fmt).option("version", tok).load(dir)
    assert(old.count() === 400L)
    assert(old.agg(max($"event_id")).as[Long].head() === 399L)
    val cur = spark.read.format(fmt).load(dir)
    assert(cur.count() === 800L)
    // the snapshot equals the first commit row for row
    assert(old.select($"event_id").as[Long].collect().sorted.toSeq ===
      (0L until 400L).toSeq)
  }

  test("the metadata-aggregate fast path serves the snapshot, not the head") {
    val (dir, tok) = twoCommits(300, 3)
    // count/min/max fold sidecars on the driver — must fold only the
    // snapshot's prefix
    val r = spark.read.format(fmt).option("version", tok).load(dir)
      .agg(count(lit(1)), min($"event_id"), max($"event_id"))
      .as[(Long, Long, Long)].head()
    assert(r === ((300L, 0L, 299L)))
  }

  test("SQL VERSION AS OF resolves through the catalog") {
    val (dir, tok) = twoCommits(200, 2)
    val base = java.nio.file.Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogver",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogver.base", base)
    val tbl = s"glogver.`${java.nio.file.Paths.get(dir).getFileName}`"
    val n = spark.sql(
      s"SELECT count(*) FROM $tbl VERSION AS OF '$tok'")
      .as[Long].head()
    assert(n === 200L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() === 400L)
  }

  test("a rewrite RETAINS history: old tokens read their exact rows; " +
      "VACUUM reclaims them and then they fail loudly") {
    val (dir, tok) = twoCommits(400, 4)
    val base = java.nio.file.Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.glogver2",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogver2.base", base)
    val tbl = s"glogver2.`${java.nio.file.Paths.get(dir).getFileName}`"
    val full = GraftLog.currentVersion(dir) // g0.8, both commits
    spark.sql(s"DELETE FROM $tbl WHERE event_id < 100")
    assert(GraftLog.generation(dir) >= 1L, "a range delete must bump")
    // retention: the pre-delete snapshots still read their EXACT rows
    val old = spark.read.format(fmt).option("version", tok).load(dir)
    assert(old.count() === 400L, "pre-rewrite token must keep reading")
    assert(old.select($"event_id").as[Long].collect().sorted.toSeq ===
      (0L until 400L).toSeq,
      "retained snapshot must serve the as-of rows, deleted ids included")
    assert(spark.read.format(fmt).option("version", full).load(dir)
      .count() === 800L)
    // current state reads the post-delete rows
    assert(spark.read.format(fmt).load(dir).count() === 700L)
    val tok2 = GraftLog.currentVersion(dir)
    // VACUUM (retention 0): retired shards + history manifests of
    // pre-rewrite generations are reclaimed
    val (files, bytes) = GraftLog.vacuum(dir)
    assert(files > 0 && bytes > 0, s"vacuum must reclaim ($files, $bytes)")
    val e = intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("version", tok).load(dir).count()
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    // ...while the current generation's token still reads
    assert(spark.read.format(fmt).option("version", tok2).load(dir)
      .count() === 700L)
    assert(spark.read.format(fmt).load(dir).count() === 700L)
    // idempotent: a second vacuum finds nothing
    assert(GraftLog.vacuum(dir)._1 === 0L)
  }

  test("vacuum retainGenerations keeps the window readable") {
    val (dir, tok0) = twoCommits(200, 2)
    // rewrite #1: delete a prefix → generation ≥ 1
    graft.sources.GraftLog.deleteWhere(dir, 0L, 49L)
    val g1tok = GraftLog.currentVersion(dir)
    val g1 = GraftLog.generation(dir)
    // rewrite #2: compaction → generation ≥ 2
    GraftLog.compact(spark, dir, 2)
    assert(GraftLog.generation(dir) > g1)
    // retain every generation back to (and including) g1: g1's token
    // must survive the vacuum, g0's must not
    val retain = (GraftLog.generation(dir) - g1).toInt
    GraftLog.vacuum(dir, retainGenerations = retain)
    assert(spark.read.format(fmt).option("version", g1tok).load(dir)
      .count() === 350L, "retained generation must keep reading")
    intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("version", tok0).load(dir).count()
    }
    // a large minAge leaves even vacuum-eligible generations in place
    val (f2, _) = GraftLog.vacuum(dir, retainGenerations = 0,
      minAgeMs = 24L * 3600 * 1000)
    assert(f2 === 0L, "minAgeMs must protect young history")
  }

  test("a compaction-superseded token reads identically until vacuumed") {
    val (dir, _) = twoCommits(150, 3)
    val tok = GraftLog.currentVersion(dir) // g0.6 — full table
    val before = spark.read.format(fmt).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq
    GraftLog.compact(spark, dir, 2)
    val viaToken = spark.read.format(fmt).option("version", tok).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(viaToken === before,
      "pre-compaction snapshot must read the pre-compaction shards")
    GraftLog.vacuum(dir)
    intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("version", tok).load(dir).count()
    }
  }

  test("shallow clone: zero-copy snapshot, independent lives, " +
      "source vacuum cannot starve the clone") {
    val (dir, tok) = twoCommits(200, 2)
    val clone = tmpDir("glog-clone").resolve("c1").toString
    // clone the HALF snapshot, not the head — version-pinned cloning
    val n = graft.sources.GraftLog.shallowClone(dir, clone, Some(tok))
    assert(n === 2, "g0.2 names two shards")
    val viaClone = spark.read.format(fmt).load(clone)
    assert(viaClone.count() === 200L)
    assert(viaClone.select($"event_id").as[Long].collect().sorted.toSeq
      === (0L until 200L).toSeq, "clone ≡ the pinned snapshot")
    // zero-copy: the clone's shards are HARDLINKS of the source's
    val firstShard = GraftLog.listShards(clone).head.file
    assert(java.nio.file.Files.getAttribute(
      java.nio.file.Paths.get(firstShard), "unix:nlink")
      .asInstanceOf[Integer] >= 2, "clone shard must be a hardlink")
    // independence: append to the clone; source unchanged
    spark.range(9000, 9010)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-02 00:00:00")).as("ts"),
        ($"id" % 7).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"))
      .write.format(fmt).mode("append").option("shards", 1).save(clone)
    assert(spark.read.format(fmt).load(clone).count() === 210L)
    assert(spark.read.format(fmt).load(dir).count() === 400L,
      "a clone append must not leak into the source")
    // the inode property: rewrite + vacuum the SOURCE; the clone's
    // hardlinked shards keep their data alive
    graft.sources.GraftLog.deleteWhere(dir, 0L, 399L)
    GraftLog.vacuum(dir)
    assert(spark.read.format(fmt).load(clone).count() === 210L,
      "source vacuum must not pull shards out from under the clone")
    // and a non-empty destination refuses
    intercept[IllegalArgumentException] {
      graft.sources.GraftLog.shallowClone(dir, clone)
    }
  }

  test("maintenance by SQL CALL: compact, clone and vacuum run at the " +
      "procedure seam with typed one-row results") {
    val (dir, _) = twoCommits(120, 6) // 12 small shards
    val base = java.nio.file.Paths.get(dir).getParent.toString
    val tbl = java.nio.file.Paths.get(dir).getFileName.toString
    spark.conf.set("spark.sql.catalog.glogp",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogp.base", base)
    // clone first (zero-copy), then compact the clone, then vacuum it
    val cloned = spark.sql(
      s"CALL glogp.clone(src => '$tbl', dst => '${tbl}_dev')")
      .as[Int].head()
    assert(cloned === 12)
    assert(spark.sql(s"SELECT count(*) FROM glogp.`${tbl}_dev`")
      .as[Long].head() === 240L)
    val (before, after) = spark.sql(
      s"CALL glogp.compact(table => '${tbl}_dev', shards => 2)")
      .as[(Int, Int)].head()
    assert((before, after) === ((12, 2)))
    // compaction retired the 12 small shards; vacuum reclaims them
    val (files, bytes) = spark.sql(
      s"CALL glogp.vacuum(table => '${tbl}_dev')").as[(Long, Long)].head()
    assert(files >= 12L && bytes > 0L, s"vacuum reclaimed ($files, $bytes)")
    // results unchanged through the whole lifecycle; source untouched
    assert(spark.sql(s"SELECT count(*) FROM glogp.`${tbl}_dev`")
      .as[Long].head() === 240L)
    assert(spark.sql(s"SELECT count(*) FROM glogp.`$tbl`")
      .as[Long].head() === 240L)
    // SHOW PROCEDURES lists exactly the maintenance surface (the
    // procedure NAME column position varies by Spark minor, so match
    // on any string cell per row)
    val listed = spark.sql("SHOW PROCEDURES IN glogp").collect()
      .flatMap(r => (0 until r.length).flatMap(i =>
        if (!r.isNullAt(i) && r.get(i).isInstanceOf[String])
          Some(r.getString(i)) else None)).toSet
    assert(Set("clone", "compact", "vacuum", "history",
      "set_retention", "analyze", "index")
      .subsetOf(listed), s"SHOW PROCEDURES listed: $listed")
    intercept[Exception] {
      spark.sql(s"CALL glogp.nonsense(table => '$tbl')").collect()
    }
  }

  test("CALL history lists every generation: pinned shard counts, " +
      "retired store, vacuum visibility") {
    val (dir, _) = twoCommits(100, 2) // 4 shards, g0
    val base = java.nio.file.Paths.get(dir).getParent.toString
    val tbl = java.nio.file.Paths.get(dir).getFileName.toString
    spark.conf.set("spark.sql.catalog.glogh",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogh.base", base)
    def hist() = spark.sql(s"CALL glogh.history(table => '$tbl')")
      .as[(Long, Int, Boolean, Long, Long, Boolean)].collect().toSeq
    // fresh table: one generation, live, nothing retired
    assert(hist() === Seq((0L, 4, true, 0L, 0L, true)))
    // compaction: g0's 4 shards retire, g1 pins 2
    GraftLog.compact(spark, dir, 2)
    val h1 = hist()
    assert(h1.map(_._1) === Seq(0L, 1L), "one row per generation")
    assert(h1.head._2 == 4 && h1.head._3 && !h1.head._6,
      s"g0 pins 4 shards, resolvable, not current: $h1")
    assert(h1.head._4 === 8L && h1.head._5 > 0L,
      s"g0's retired store holds its 4 shards + 4 sidecars: $h1")
    assert(h1(1)._2 === 2 && h1(1)._6, s"g1 is current with 2 shards: $h1")
    // vacuum: g0 becomes unresolvable, retired store empty
    GraftLog.vacuum(dir)
    val h2 = hist()
    assert(h2.head._3 === false && h2.head._4 === 0L,
      s"vacuumed generation must list as unresolvable: $h2")
    assert(h2(1)._2 === 2 && h2(1)._6)
  }

  test("a delta slice across a structural rewrite refuses loudly") {
    val (dir, tok) = twoCommits(100, 2)
    graft.sources.GraftLog.deleteWhere(dir, 0L, 9L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("sinceVersion", tok).load(dir).count()
    }
    assert(e.getMessage.contains("rewrite"), e.getMessage)
  }

  test("sinceVersion slice equals the anti-join delta") {
    val (dir, tok) = twoCommits(250, 5)
    val delta = spark.read.format(fmt).option("sinceVersion", tok).load(dir)
    val cur = spark.read.format(fmt).load(dir)
    val old = spark.read.format(fmt).option("version", tok).load(dir)
    val byAntiJoin = cur.join(old.select($"event_id".as("o")),
      $"event_id" === $"o", "left_anti")
    assert(delta.count() === 250L)
    assert(delta.except(byAntiJoin).isEmpty &&
      byAntiJoin.drop("o").except(delta).isEmpty,
      "shard-slice delta must equal the anti-join definition")
    // composes with version: since tok AS OF tok = empty window
    assert(spark.read.format(fmt).option("sinceVersion", tok)
      .option("version", tok).load(dir).count() === 0L)
  }

  test("a delta read PLANS only the delta's shards (one partition each)") {
    val (dir, tok) = twoCommits(300, 6)
    // 12 shards on disk; the slice must plan exactly the 6 appended
    // after the token — the manifest-arithmetic guarantee, visible as
    // the scan's partition count (one InputPartition per shard)
    val delta = spark.read.format(fmt).option("sinceVersion", tok).load(dir)
    assert(delta.rdd.getNumPartitions === 6,
      "sinceVersion must plan one partition per DELTA shard only")
    val full = spark.read.format(fmt).load(dir)
    assert(full.rdd.getNumPartitions === 12)
    val old = spark.read.format(fmt).option("version", tok).load(dir)
    assert(old.rdd.getNumPartitions === 6)
  }

  test("malformed and future tokens are rejected") {
    val (dir, _) = twoCommits(100, 2)
    intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("version", "nonsense").load(dir).count()
    }
    intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("version", "g0.99").load(dir).count()
    }
  }
}
