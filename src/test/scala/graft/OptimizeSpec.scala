package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Bin-packing OPTIMIZE (`GraftLog.optimize` / `CALL glog.optimize`):
  * merge ONLY the shards smaller than the target, byte-untouched
  * large shards, one atomic swap — the streaming small-file answer at
  * O(small bytes) instead of compact's O(table). */
class OptimizeSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  /** One settled big shard (ids [0, big)) + `tail` single-shard
    * micro-appends of `per` ids each — the streaming aftermath. */
  private def smallFileLog(big: Int, tail: Int, per: Int): String = {
    val dir = tmpDir("glog-opt").toString
    feed(0, big).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    (0 until tail).foreach { i =>
      feed(big + i * per, big + (i + 1) * per).write.format(fmt)
        .mode("append").option("shards", 1).save(dir)
    }
    dir
  }

  private def ids(dir: String): Seq[Long] =
    spark.read.format(fmt).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq

  test("optimize merges the small tail and leaves the big shard alone") {
    val dir = smallFileLog(big = 8000, tail = 12, per = 50)
    assert(GraftLog.listShards(dir).size === 13)
    val bigShard = GraftLog.listShards(dir).maxBy(_.bytes)
    val bigBytes = bigShard.bytes
    val bigMtime = Files.getLastModifiedTime(
      Paths.get(bigShard.file)).toMillis
    val target = bigBytes / 2 // far above every micro shard
    val (mergedN, bins) = GraftLog.optimize(spark, dir, target)
    assert(mergedN === 12 && bins >= 1 && bins < 12,
      s"12 micro shards binned into fewer: $bins")
    // the settled shard is byte-identical and was never rewritten
    val after = GraftLog.listShards(dir)
    assert(after.size === 1 + bins)
    val bigAfter = after.maxBy(_.bytes)
    assert(bigAfter.file === bigShard.file &&
      bigAfter.bytes === bigBytes &&
      Files.getLastModifiedTime(Paths.get(bigAfter.file)).toMillis
        === bigMtime,
      "optimize must not touch a well-sized shard")
    assert(ids(dir) === (0L until 8600L), "pure layout change")
    // merged shards carry fresh exact sidecars → the metadata
    // aggregate fast path still serves
    val r = spark.read.format(fmt).load(dir)
      .agg(count(lit(1)), min($"event_id"), max($"event_id"))
      .as[(Long, Long, Long)].head()
    assert(r === ((8600L, 0L, 8599L)))
  }

  test("a pre-optimize token still reads; dv keys drop through the merge") {
    val dir = smallFileLog(big = 2000, tail = 6, per = 40)
    // suppress two ids living in micro shards, one in the big shard
    GraftLog.deleteVectors(dir, Seq(3L, 2010L, 2130L))
    val tok = GraftLog.currentVersion(dir)
    GraftLog.optimize(spark, dir, GraftLog.listShards(dir)
      .maxBy(_.bytes).bytes / 2)
    val visible = (0L until 2240L)
      .filterNot(Seq(3L, 2010L, 2130L).contains)
    assert(ids(dir) === visible,
      "merged bins apply the vectors; the untouched big shard keeps its")
    // the big shard was NOT rewritten, so its vector must still be
    // live (id 3 suppressed at read time, not physically)
    val dvd = Paths.get(dir, "_dv")
    val s = Files.list(dvd)
    val live = try s.iterator().hasNext finally s.close()
    assert(live, "the untouched shard's vector stays live")
    // retention across the optimize swap
    val old = spark.read.format(fmt).option("version", tok).load(dir)
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(old === visible)
  }

  test("optimize is a no-op below two candidates; CALL surface works") {
    val base = tmpDir("glog-opt-cat").toString
    spark.conf.set("spark.sql.catalog.glogopt",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogopt.base", base)
    feed(0, 1000).write.format(fmt).mode("append")
      .option("shards", 1).save(s"$base/t")
    assert(GraftLog.optimize(spark, s"$base/t", 1L << 20) === ((0, 0)))
    feed(1000, 1050).write.format(fmt).mode("append")
      .option("shards", 1).save(s"$base/t")
    feed(1050, 1100).write.format(fmt).mode("append")
      .option("shards", 1).save(s"$base/t")
    val r = spark.sql(
      "CALL glogopt.optimize(table => 't', target_bytes => 4096)")
      .as[(Int, Int)].head()
    assert(r === ((2, 1)), "the two micro appends merge into one bin")
    assert(spark.sql("SELECT count(*) FROM glogopt.t").as[Long].head()
      === 1100L)
  }
}
