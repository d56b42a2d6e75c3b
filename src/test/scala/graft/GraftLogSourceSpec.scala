package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** The DSv2 connector's two contracts, asserted end to end:
  * sidecar-stat file pruning from pushed filters (I/O-only — results
  * identical to the unpruned read) and column pruning at the parser.
  */
class GraftLogSourceSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  /** 400 rows in 4 shards of 100, event_id ranges [0,99]..[300,399]. */
  private def writeShards(): String = {
    val dir = tmpDir("graftlog_").toString
    val rows = (0L until 400L).map(i =>
      (i, 1700000000000000L + i * 1000000L, i % 7, s"t${i % 3}", i * 0.5))
    GraftLog.write(rows, dir, rowsPerShard = 100)
    dir
  }

  test("full scan reads every shard and round-trips all columns") {
    val dir = writeShards()
    GraftLog.filesOpened.set(0)
    val df = spark.read.format(fmt).load(dir)
    assert(df.schema === GraftLog.schema)
    // driver-side sort: a global orderBy adds a range-partitioning
    // SAMPLING pass that opens every shard a second time, which would
    // muddy the opened-files assertion
    val got = df
      .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1)
    assert(got.length === 400)
    assert(got(7) === ((7L, 1700000007000000L, 0L, "t1", 3.5)))
    assert(GraftLog.filesOpened.get() === 4)
  }

  test("pushed event_id range prunes shards at planning time") {
    val dir = writeShards()
    GraftLog.filesOpened.set(0)
    val n = spark.read.format(fmt).load(dir)
      .filter($"event_id" >= 250L && $"event_id" < 320L).count()
    assert(n === 70)
    // [250, 319] overlaps shards [200,299] and [300,399] only
    assert(GraftLog.filesOpened.get() === 2)
    // an exact point probe opens exactly one shard
    GraftLog.filesOpened.set(0)
    val one = spark.read.format(fmt).load(dir)
      .filter($"event_id" === 137L).collect()
    assert(one.length === 1 && GraftLog.filesOpened.get() === 1)
    // an empty interval opens nothing
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(dir)
      .filter($"event_id" > 1000L).count() === 0)
    assert(GraftLog.filesOpened.get() === 0)
  }

  test("pruning is I/O-only: filtered results equal the parquet twin") {
    val dir = writeShards()
    val viaLog = spark.read.format(fmt).load(dir)
      .filter($"event_id" % 2 === 0 && $"event_id" >= 100L)
      .groupBy($"event_type").agg(count(lit(1)).as("n"),
        sum($"value").cast("decimal(18,4)").cast("double").as("v"))
      .orderBy($"event_type")
    val twinDir = tmpDir("graftlog_twin_").toString
    spark.read.format(fmt).load(dir).write.parquet(s"$twinDir/t")
    val viaParquet = spark.read.parquet(s"$twinDir/t")
      .filter($"event_id" % 2 === 0 && $"event_id" >= 100L)
      .groupBy($"event_type").agg(count(lit(1)).as("n"),
        sum($"value").cast("decimal(18,4)").cast("double").as("v"))
      .orderBy($"event_type")
    assert(viaLog.collect().toSeq === viaParquet.collect().toSeq)
  }

  test("streaming read drains shard-by-shard and equals the batch read") {
    val dir = writeShards()
    val sink = tmpDir("graftlog_sink_").toString
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format(fmt)
      .option("maxShardsPerTrigger", "1")
      .load(dir)
      .writeStream
      .option("checkpointLocation", s"$sink/_cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        batch.write.mode("append").parquet(s"$sink/out")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // admission control: 4 shards at 1 shard/trigger = 4 batches of 100
    assert(batchSizes.sorted == Seq(100L, 100L, 100L, 100L))
    val drained = spark.read.parquet(s"$sink/out")
      .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1).toSeq
    val viaBatch = spark.read.format(fmt).load(dir)
      .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(drained == viaBatch)
  }

  test("a restarted stream resumes from the checkpoint, not from zero") {
    val dir = writeShards()
    val sink = tmpDir("graftlog_resume_").toString
    def drain(): Unit = {
      val q = spark.readStream.format(fmt).load(dir)
        .writeStream
        .option("checkpointLocation", s"$sink/_cp")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$sink/out")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(s"$sink/out").count() === 400)
    // append two NEW shards, re-drain from the same checkpoint: only
    // the new shards flow (no re-emission of the first 400 rows)
    val more = (400L until 500L).map(i =>
      (i, 1700000000000000L + i * 1000000L, i % 7, s"t${i % 3}", i * 0.5))
    // write() numbers shards from 0 — stage in a side dir, then move
    // in under fresh names (ingest appending new shards)
    val stage = tmpDir("graftlog_stage_").toString
    GraftLog.write(more, stage, rowsPerShard = 50)
    val p = java.nio.file.Paths.get(dir)
    val sp = java.nio.file.Paths.get(stage)
    Seq(0, 1).foreach { i =>
      java.nio.file.Files.move(sp.resolve(f"shard-$i%05d.graftlog"),
        p.resolve(f"shard-${4 + i}%05d.graftlog"))
      java.nio.file.Files.move(sp.resolve(f"shard-$i%05d.meta"),
        p.resolve(f"shard-${4 + i}%05d.meta"))
    }
    drain()
    assert(spark.read.parquet(s"$sink/out").count() === 500)
  }

  test("column pruning reaches the reader (scan description shows it)") {
    val dir = writeShards()
    val df = spark.read.format(fmt).load(dir).select($"event_type")
    val desc = df.queryExecution.executedPlan.toString
    // the DSv2 scan prints our Scan.description(): pruned to 1 column
    assert(desc.contains("cols=[event_type]"), desc)
    assert(df.distinct().count() === 3)
  }

  test("V2 batch write round-trips and the connector enforces the layout") {
    val srcDir = writeShards()
    val src = spark.read.format(fmt).load(srcDir)
    val out = tmpDir("graftlog_v2w_").toString
    // NO caller-side repartition/sort: RequiresDistributionAndOrdering
    // must make Catalyst plan the range exchange itself (shards=4
    // pins the exchange width — AQE would otherwise coalesce 400
    // rows into one shard and the pruning assertion would be vacuous)
    src.repartition(8) // deliberately scrambled input layout
      .write.format(fmt).mode("append").option("shards", 4).save(out)
    // round trip is exact
    val back = spark.read.format(fmt).load(out)
      .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1)
    val want = src
      .select($"event_id", unix_micros($"ts").as("us"), $"user_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1)
    assert(back.toSeq === want.toSeq)
    // every shard has a sidecar and the ranges are DISJOINT — the
    // connector-enforced clustering the pruning depends on
    val metas = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".meta"))
      .toSeq.sorted
      .map { m =>
        val p = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(m))).trim.split('|')
        (p(0).toLong, p(1).toLong, p(2).toLong)
      }
    assert(metas.nonEmpty)
    assert(metas.map(_._3).sum === 400L)
    metas.sliding(2).foreach {
      case Seq((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 < lo2, s"overlapping shard ranges: $metas")
      case _ => ()
    }
    // no tmp litter after commit
    val leftover = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".tmp")).toSeq
    assert(leftover.isEmpty, s"uncommitted tmp files: $leftover")
    // and the V2-written layout prunes exactly like GraftLog.write's
    GraftLog.filesOpened.set(0)
    assert(spark.read.format(fmt).load(out)
      .filter($"event_id" === 137L).count() === 1)
    assert(GraftLog.filesOpened.get() < metas.size,
      "point probe opened every shard — stats gave no pruning")
  }

  test("V2 write rejects a mismatched schema at plan time") {
    val out = tmpDir("graftlog_badschema_").toString
    val bad = Seq((1L, "x")).toDF("event_id", "event_type")
    // Spark's V2 analysis rejects the frame against Table.schema()
    // before a single writer task launches
    val e = intercept[Exception] {
      bad.write.format(fmt).mode("append").save(out)
    }
    assert(e.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE") ||
      e.getMessage.contains("graftlog sink needs schema"), e.getMessage)
    // nothing was written
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)) ||
      java.nio.file.Files.list(java.nio.file.Paths.get(out))
        .iterator().asScala.isEmpty)
  }
}
