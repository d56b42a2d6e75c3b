package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.sources.GraftLog

/** Schema evolution beyond ADD COLUMN (r13): RENAME COLUMN
  * (metadata-only — the line position is the stable field id),
  * DROP COLUMN (a tombstoned slot = projection mask, later columns
  * keep their positions, physical reclaim rides the next rewrite),
  * and BIGINT→DOUBLE widening (every stored long token parses as the
  * double it denotes — zero rewrite). Every DDL is a versioned
  * commit: the pre-change schema archives under its generation, so
  * time travel reads each snapshot UNDER ITS OWN SCHEMA. */
class GraftLogSchemaEvolutionSpec extends SparkSuite {
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
    val base = tmpDir("glog-se").toString
    spark.conf.set(s"spark.sql.catalog.se$seq",
      "graft.sources.GraftLogCatalog")
    spark.conf.set(s"spark.sql.catalog.se$seq.base", base)
    feed(0, n).write.format(fmt).mode("append")
      .option("shards", shards).save(s"$base/t")
    (s"se$seq.t", s"$base/t")
  }

  private def listing(dir: String) = GraftLog.listShards(dir)
    .map(s => (s.file, s.bytes)).sortBy(_._1)

  test("RENAME COLUMN is metadata-only and resolves the same slot") {
    val (tbl, dir) = freshTable(100, 2)
    GraftLog.addColumn(dir, "score", LongType, Some("7"))
    feed(100, 120).withColumn("score", $"event_id")
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val before = listing(dir)
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN score TO points")
    assert(listing(dir) === before, "zero data rewrite")
    val df = spark.read.format(fmt).load(dir)
    assert(df.columns.contains("points") && !df.columns.contains("score"))
    // the renamed column still reads the SAME stored field: 100 old
    // rows read the default 7, 20 explicit rows their event_id
    assert(df.agg(sum($"points")).as[Long].head() ===
      100L * 7 + (100L until 120L).sum)
    intercept[Exception] {
      spark.sql(s"SELECT score FROM $tbl").collect()
    }
  }

  test("DROP COLUMN masks the slot; later columns keep their positions") {
    val (tbl, dir) = freshTable(50, 1)
    GraftLog.addColumn(dir, "a", LongType, Some("1"))
    GraftLog.addColumn(dir, "b", StringType, Some("keep"))
    feed(50, 60).withColumn("a", $"event_id")
      .withColumn("b", lit("x"))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val before = listing(dir)
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN a")
    assert(listing(dir) === before, "zero data rewrite")
    val df = spark.read.format(fmt).load(dir)
    assert(!df.columns.contains("a"))
    // b (written AFTER a in the line) still reads correctly: the
    // tombstoned slot keeps b's position
    assert(df.groupBy($"b").count().as[(String, Long)].collect().toMap
      === Map("keep" -> 50L, "x" -> 10L))
    // writes after the drop keep working; a re-added `a` is a FRESH
    // slot — old values can never bleed in
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN a BIGINT DEFAULT 0")
    feed(60, 65).withColumn("b", lit("y")).withColumn("a", lit(99L))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val re = spark.read.format(fmt).load(dir)
    assert(re.groupBy($"a").count().as[(Option[Long], Long)]
      .collect().toMap === Map(Some(0L) -> 60L, Some(99L) -> 5L),
      "re-added column reads its default + new values, never the " +
        "dropped slot's old longs")
    // compact materializes the mask physically and preserves the rest
    GraftLog.compact(spark, dir, 1)
    val flat = spark.read.format(fmt).load(dir)
    assert(flat.count() === 65L)
    assert(flat.groupBy($"b").count().as[(String, Long)].collect().toMap
      === Map("keep" -> 50L, "x" -> 10L, "y" -> 5L))
  }

  test("BIGINT -> DOUBLE widening reads old longs as doubles, no rewrite") {
    val (tbl, dir) = freshTable(40, 1)
    GraftLog.addColumn(dir, "w", LongType, Some("3"))
    feed(40, 50).withColumn("w", $"event_id")
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val before = listing(dir)
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN w TYPE DOUBLE")
    assert(listing(dir) === before, "zero data rewrite")
    val df = spark.read.format(fmt).load(dir)
    assert(df.schema("w").dataType === DoubleType)
    assert(df.agg(sum($"w")).as[Double].head() ===
      40 * 3.0 + (40 until 50).map(_.toDouble).sum)
    // post-widen writes carry fractional values
    feed(50, 52).withColumn("w", lit(0.5))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    assert(spark.read.format(fmt).load(dir)
      .filter($"w" === 0.5).count() === 2L)
    // narrowing and non-long sources refuse
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN w TYPE BIGINT")
    }
  }

  test("time travel reads each snapshot under its OWN schema") {
    val (tbl, dir) = freshTable(30, 1)
    val tokBase = GraftLog.currentVersion(dir)
    GraftLog.addColumn(dir, "c", LongType, Some("5"))
    val tokAdded = GraftLog.currentVersion(dir)
    GraftLog.renameColumn(dir, "c", "d")
    val tokRenamed = GraftLog.currentVersion(dir)
    GraftLog.widenColumn(dir, "d")
    val tokWidened = GraftLog.currentVersion(dir)
    GraftLog.dropColumn(dir, "d")
    // current: the column is gone
    assert(!spark.read.format(fmt).load(dir).columns.contains("d"))
    // before the ADD: base schema only
    val s0 = spark.read.format(fmt).option("version", tokBase).load(dir)
    assert(s0.columns.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value"))
    // after the ADD: `c` with its default
    val s1 = spark.read.format(fmt).option("version", tokAdded).load(dir)
    assert(s1.columns.contains("c") && !s1.columns.contains("d"))
    assert(s1.agg(sum($"c")).as[Long].head() === 150L)
    // after the RENAME: `d`, long
    val s2 = spark.read.format(fmt).option("version", tokRenamed).load(dir)
    assert(s2.columns.contains("d") && !s2.columns.contains("c"))
    assert(s2.schema("d").dataType === LongType)
    // after the WIDEN: `d`, double
    val s3 = spark.read.format(fmt).option("version", tokWidened).load(dir)
    assert(s3.schema("d").dataType === DoubleType)
    assert(s3.agg(sum($"d")).as[Double].head() === 150.0)
    // the catalog VERSION AS OF route resolves the same way
    assert(spark.sql(
      s"SELECT sum(c) FROM $tbl VERSION AS OF '$tokAdded'")
      .as[Long].head() === 150L)
  }

  test("guards: base columns protected; constraints block rename/drop") {
    val (_, dir) = freshTable(20, 1)
    intercept[IllegalArgumentException] {
      GraftLog.renameColumn(dir, "value", "v2")
    }
    intercept[IllegalArgumentException] {
      GraftLog.dropColumn(dir, "event_type")
    }
    intercept[IllegalArgumentException] {
      GraftLog.widenColumn(dir, "user_id")
    }
    GraftLog.addColumn(dir, "guarded", LongType, Some("1"))
    GraftLog.addConstraint(spark, dir, "g_pos", "guarded > 0")
    val e = intercept[IllegalArgumentException] {
      GraftLog.renameColumn(dir, "guarded", "g2")
    }
    assert(e.getMessage.contains("g_pos"))
    intercept[IllegalArgumentException] {
      GraftLog.dropColumn(dir, "guarded")
    }
    intercept[IllegalArgumentException] {
      GraftLog.widenColumn(dir, "guarded")
    }
    // renaming to a taken name refuses; unknown column refuses
    GraftLog.addColumn(dir, "other", LongType)
    intercept[IllegalArgumentException] {
      GraftLog.renameColumn(dir, "other", "value")
    }
    intercept[IllegalArgumentException] {
      GraftLog.renameColumn(dir, "ghost", "x")
    }
  }

  test("evolved writes + CoW UPDATE + delta MERGE survive the full " +
      "rename/widen/drop lifecycle") {
    val (tbl, dir) = freshTable(100, 2)
    GraftLog.addColumn(dir, "m", LongType, Some("2"))
    GraftLog.renameColumn(dir, "m", "metric")
    GraftLog.widenColumn(dir, "metric")
    feed(100, 110).withColumn("metric", lit(1.5))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    // CoW UPDATE round-trips the evolved column through the rewrite
    spark.sql(s"UPDATE $tbl SET value = value + 1 WHERE event_id < 10")
    // delta MERGE updates rows carrying the evolved column
    Seq((105L, -1.0)).toDF("event_id", "value")
      .createOrReplaceTempView("se_merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING se_merge_src s
          ON t.event_id = s.event_id
          WHEN MATCHED THEN UPDATE SET value = s.value""")
    val df = spark.read.format(fmt).load(dir)
    assert(df.count() === 110L)
    assert(df.filter($"event_id" === 105L)
      .select($"value", $"metric").as[(Double, Double)].head()
      === ((-1.0, 1.5)), "the merge preserved the evolved column")
    assert(df.agg(sum($"metric")).as[Double].head() ===
      100 * 2.0 + 10 * 1.5)
    GraftLog.dropColumn(dir, "metric")
    assert(spark.read.format(fmt).load(dir).count() === 110L)
    assert(!spark.read.format(fmt).load(dir).columns.contains("metric"))
  }

  test("delta MERGE writes correctly THROUGH a tombstoned slot") {
    val (tbl, dir) = freshTable(60, 1)
    GraftLog.addColumn(dir, "a", LongType, Some("1"))
    GraftLog.addColumn(dir, "b", StringType, Some("k"))
    GraftLog.dropColumn(dir, "a") // tombstone BETWEEN base cols and b
    // merge-insert rows must render the NULL sentinel in a's slot so
    // b keeps its physical position
    feed(100, 105).withColumn("b", lit("merged"))
      .createOrReplaceTempView("se_tomb_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING se_tomb_src s
          ON t.event_id = s.event_id
          WHEN NOT MATCHED THEN INSERT *""")
    val df = spark.read.format(fmt).load(dir)
    assert(df.count() === 65L)
    assert(df.groupBy($"b").count().as[(String, Long)].collect().toMap
      === Map("k" -> 60L, "merged" -> 5L),
      "b reads its own slot on both old and merge-written lines")
    // and a re-added `a` still never sees ghost values
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN a BIGINT DEFAULT 9")
    assert(spark.read.format(fmt).load(dir)
      .groupBy($"a").count().as[(Option[Long], Long)].collect().toMap
      === Map(Some(9L) -> 65L))
  }

  test("DDL invalidates the column's index files — a re-added name " +
      "never prunes by ghost values") {
    val (tbl, dir) = freshTable(100, 1)
    GraftLog.addColumn(dir, "w", LongType)
    feed(100, 200).withColumn("w", $"event_id") // values 100..199
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    assert(GraftLog.buildIndex(spark, dir, "w", "range") >= 1)
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN w")
    // the index files are GONE — shard content is unchanged by the
    // metadata-only DDL, so a same-name re-add would otherwise
    // resolve them (echo still valid) and prune by the OLD values
    assert(!GraftLog.indexedColumns(dir).contains("w"))
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN w BIGINT DEFAULT 500")
    val got = spark.read.format(fmt).load(dir)
      .filter($"w" === 500L).count()
    assert(got === 200L,
      "every row reads the new exists-default — a stale range index " +
        "[100,199] would have pruned this probe to zero rows")
    // rename CARRIES them (r14): the echo binds to shard content and
    // the values are the column's own, so pruning survives the DDL
    // under the new name with zero rebuild — and nothing remains
    // under the old name for a re-add to ghost-resolve
    GraftLog.buildIndex(spark, dir, "w", "range")
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN w TO w2")
    assert(!GraftLog.indexedColumns(dir).contains("w") &&
      GraftLog.indexedColumns(dir).contains("w2"))
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"w2" === 999999L).count() === 0L)
    assert(GraftLog.filesOpened.get() === 0,
      "the carried index proves absence under the new name")
  }

  test("the streaming sink survives index kinds staled by a DDL") {
    import org.apache.spark.sql.streaming.Trigger
    val (tbl, dir) = freshTable(100, 1)
    GraftLog.addColumn(dir, "w", LongType, Some("1"))
    GraftLog.buildIndex(spark, dir, "w", "bloom")
    // leave a STALE index listing behind the DDL's back (simulating
    // any future invalidation race): re-create the file after drop
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN w")
    val orphan = Paths.get(dir, "_index", "zz.graftlog.w.bloom")
    Files.createDirectories(orphan.getParent)
    Files.write(orphan, "bloom|junk".getBytes("UTF-8"))
    val src = tmpDir("glog-se-ssrc").toString
    feed(500, 560).write.format(fmt).mode("append")
      .option("shards", 2).save(src)
    val cp = tmpDir("glog-se-scp").toString
    val q = spark.readStream.format(fmt).load(src)
      .writeStream.format(fmt)
      .option("path", dir).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.read.format(fmt).load(dir).count() === 160L,
      "epoch commits land despite the unbuildable stale index kind")
  }

  test("a schema DDL commit emits NO change-feed rows") {
    val (_, dir) = freshTable(50, 1)
    val tok0 = GraftLog.currentVersion(dir)
    GraftLog.addColumn(dir, "x", LongType, Some("2"))
    GraftLog.renameColumn(dir, "x", "y")
    assert(spark.read.format(fmt).option("readChangeFeed", "true")
      .option("sinceVersion", tok0).load(dir).count() === 0L,
      "metadata-only commits change no rows — the feed is empty")
  }

  test("DATE/TIMESTAMP/BOOLEAN evolved columns: typed defaults, " +
      "typed appends, explicit NULLs, and time travel") {
    import org.apache.spark.sql.types.{BooleanType, DateType,
      TimestampType}
    val (tbl, dir) = freshTable(100, 2)
    val tok0 = GraftLog.currentVersion(dir)
    // internal-token defaults: epoch-day int, epoch-micro long, bool
    val day0 = java.time.LocalDate.parse("2024-06-01").toEpochDay
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN d DATE " +
      "DEFAULT DATE'2024-06-01'")
    GraftLog.addColumn(dir, "t", TimestampType,
      Some("1700000000000000"))
    GraftLog.addColumn(dir, "b", BooleanType, Some("true"))
    val df0 = spark.read.format(fmt).load(dir)
    assert(df0.schema("d").dataType === DateType)
    assert(df0.schema("t").dataType === TimestampType)
    assert(df0.schema("b").dataType === BooleanType)
    // exists-defaults materialize on every pre-ALTER row
    assert(df0.filter($"d" === lit("2024-06-01").cast("date") &&
      unix_micros($"t") === 1700000000000000L && $"b").count() === 100L)
    // typed append with explicit values AND explicit NULLs
    feed(100, 110)
      .withColumn("d", when($"event_id" % 2 === 0,
        date_add(lit("2024-06-01").cast("date"), 1)))
      .withColumn("t", when($"event_id" % 2 === 0,
        timestamp_micros(lit(1700000000000001L))))
      .withColumn("b", when($"event_id" % 2 === 0, lit(false)))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val app = spark.read.format(fmt).load(dir)
      .filter($"event_id" >= 100)
    assert(app.filter($"d".isNull).count() === 5,
      "explicit NULLs round-trip (NullToken, not the default)")
    assert(app.filter($"b" === false).count() === 5)
    assert(app.filter(unix_micros($"t") === 1700000000000001L)
      .count() === 5)
    assert(app.filter($"d" === date_add(
      lit("2024-06-01").cast("date"), 1)).count() === 5)
    assert(day0 === 19875L, "epoch-day sanity for the stored token")
    // widen stays BIGINT→DOUBLE only — the typed columns refuse
    Seq("d", "t", "b").foreach { c =>
      intercept[IllegalArgumentException] {
        GraftLog.widenColumn(dir, c)
      }
    }
    // rename + time travel: each snapshot reads its own schema
    GraftLog.renameColumn(dir, "t", "t2")
    assert(spark.read.format(fmt).load(dir).columns.contains("t2"))
    val pre = spark.read.format(fmt).option("version", tok0).load(dir)
    assert(!pre.columns.contains("d") && !pre.columns.contains("t") &&
      !pre.columns.contains("b") && !pre.columns.contains("t2"),
      "the baseline token predates every typed column")
    // TIMESTAMP_NTZ rides the same epoch-micro tokens
    GraftLog.addColumn(dir, "tn",
      org.apache.spark.sql.types.TimestampNTZType,
      Some("1700000000000000"))
    val ntz = spark.read.format(fmt).load(dir)
    assert(ntz.schema("tn").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    // 1700000000000000 µs = 2023-11-14T22:13:20 wall time (NTZ has
    // no zone by definition)
    assert(ntz.filter($"tn" === lit("2023-11-14 22:13:20")
      .cast("timestamp_ntz")).count() === 110L,
      "NTZ default materializes on every row")
    // catalog DDL refuses non-tokenizable types loudly
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMN z DECIMAL(10,2)")
    }
    assert(e.getMessage.contains("BIGINT/DOUBLE/STRING/DATE/" +
      "TIMESTAMP/TIMESTAMP_NTZ/BOOLEAN") || e.getCause != null)
  }
}
