package graft.tools

import java.nio.file.{Files, Paths}

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** One-off diagnostic for the append∥compact race: loops the
  * GraftLogConcurrencySpec scenario and, on a duplicate/lost row,
  * dumps which FILES hold the offending ids (via the _shard metadata
  * column) plus the dir/retired/history state. */
object ConcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("conc-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val fmt = "graft.sources.GraftLogSource"

    def feed(lo: Long, hi: Long) = spark.range(lo, hi)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
        ($"id" % 7).as("user_id"), lit("click").as("event_type"),
        ($"id" % 100).cast("double").as("value"))

    var round = 0
    while (round < 40) {
      round += 1
      val dir = Files.createTempDirectory("concprobe").toString
      feed(0, 1000).write.format(fmt).mode("append")
        .option("shards", 10).save(dir)
      val appender = Future {
        (0 until 10).foreach { b =>
          feed(10000L + b * 50, 10000L + (b + 1) * 50)
            .coalesce(1).write.format(fmt).mode("append").save(dir)
        }
      }
      val compactor = Future {
        (0 until 3).foreach(_ => GraftLog.compact(spark, dir, 4))
      }
      Await.result(Future.sequence(Seq(appender, compactor)), 180.seconds)
      val got = spark.read.format(fmt).load(dir)
        .select($"event_id", $"_shard").as[(Long, String)].collect()
        .sortBy(_._1).toSeq
      val want = ((0L until 1000L) ++ (10000L until 10500L)).sorted
      if (got.map(_._1) != want) {
        println(s"=== ROUND $round MISMATCH ===")
        val dupes = got.groupBy(_._1).filter(_._2.size > 1)
        val missing = want.toSet -- got.map(_._1).toSet
        println(s"dup ids: ${dupes.keys.toSeq.sorted.take(5)} ... " +
          s"(${dupes.size} total); missing: ${missing.toSeq.sorted.take(5)}")
        dupes.toSeq.sortBy(_._1).take(3).foreach { case (id, rs) =>
          println(s"  id $id in files: ${rs.map(_._2).mkString(", ")}")
        }
        println("--- live dir ---")
        Files.list(Paths.get(dir)).iterator().asScala.toSeq
          .map(_.getFileName.toString).sorted.foreach(n => println(s"  $n"))
        println("--- retired ---")
        val rd = Paths.get(dir, "_retired")
        if (Files.isDirectory(rd))
          Files.walk(rd).iterator().asScala.toSeq
            .map(p => rd.relativize(p).toString).sorted
            .foreach(n => println(s"  $n"))
        println(s"generation=${GraftLog.generation(dir)}")
        sys.exit(1)
      }
      println(s"round $round ok")
    }
    println("no mismatch in 40 rounds")

    // ---- structural ∥ structural stress (r13: optimistic commits) --
    // compact ∥ range-delete ∥ dv-delete ∥ optimize all racing one
    // appender: every structural loser must retry (driver ops) and
    // the final state must be EXACT — deleted ranges gone, dv keys
    // suppressed, appended rows present, no dupes, no orphans.
    var r2 = 0
    while (r2 < 20) {
      r2 += 1
      val dir = Files.createTempDirectory("concprobe-s").toString
      feed(0, 1000).write.format(fmt).mode("append")
        .option("shards", 10).save(dir)
      val work = Seq(
        Future { GraftLog.compact(spark, dir, 4) },
        Future { GraftLog.deleteWhere(dir, 200L, 299L) },
        Future { GraftLog.deleteVectors(dir, Seq(501L, 502L, 503L)) },
        Future { GraftLog.optimize(spark, dir, 1L << 20) },
        Future {
          feed(5000L, 5100L).coalesce(1)
            .write.format(fmt).mode("append").save(dir)
        })
      Await.result(Future.sequence(work), 180.seconds)
      val got = spark.read.format(fmt).load(dir)
        .select($"event_id").as[Long].collect().sorted.toSeq
      val want = ((0L until 1000L)
        .filterNot(i => i >= 200L && i <= 299L)
        .filterNot(Set(501L, 502L, 503L)) ++ (5000L until 5100L)).sorted
      if (got != want) {
        println(s"=== STRUCTURAL ROUND $r2 MISMATCH ===")
        val dupes = got.groupBy(identity).filter(_._2.size > 1).keys
        println(s"dupes: ${dupes.toSeq.sorted.take(5)}; " +
          s"missing: ${(want.toSet -- got.toSet).toSeq.sorted.take(5)}; " +
          s"extra: ${(got.toSet -- want.toSet).toSeq.sorted.take(5)}")
        sys.exit(1)
      }
      val litter = Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".tmp")).toSeq
      if (litter.nonEmpty) {
        println(s"=== STRUCTURAL ROUND $r2 ORPHANS: $litter ===")
        sys.exit(1)
      }
      println(s"structural round $r2 ok")
    }
    println("no mismatch in 20 structural rounds")
    spark.stop()
  }
}
