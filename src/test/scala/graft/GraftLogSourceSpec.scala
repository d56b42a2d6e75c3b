package graft

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

  test("column pruning reaches the reader (scan description shows it)") {
    val dir = writeShards()
    val df = spark.read.format(fmt).load(dir).select($"event_type")
    val desc = df.queryExecution.executedPlan.toString
    // the DSv2 scan prints our Scan.description(): pruned to 1 column
    assert(desc.contains("cols=[event_type]"), desc)
    assert(df.distinct().count() === 3)
  }
}
