package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.Ev

/** Cross-micro-batch state: a session that spans two files must be
  * stitched together by the state store, and only closed sessions are
  * emitted. */
class StatefulSessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("session spanning two micro-batches is stitched; open tail not emitted") {
    val dir = tmpDir("sess-in")
    // batch 1: two events 10 min apart; batch 2: one event 5 min
    // later (same session!) then one 2 h later (new session)
    val b1 = Seq(Ev(1L, 1L, us(600), 1.0), Ev(1L, 2L, us(610), 2.0))
    val b2 = Seq(Ev(1L, 3L, us(615), 3.0), Ev(1L, 4L, us(735), 4.0))
    val f1 = dir.resolve("b1.parquet"); val f2 = dir.resolve("b2.parquet")
    b1.toDF().coalesce(1).write.parquet(f1.toString)
    b2.toDF().coalesce(1).write.parquet(f2.toString)
    Files.walk(dir).forEach { p =>
      if (p.toString.endsWith("b1.parquet") || p.getParent.toString.endsWith("b1.parquet"))
        Files.setLastModifiedTime(p, FileTime.fromMillis(1_700_000_000_000L))
      else Files.setLastModifiedTime(p, FileTime.fromMillis(1_700_000_100_000L))
    }

    val stream = spark.readStream
      .schema(b1.toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .as[Ev]
    val q = StatefulSessionize.sessionize(stream, gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("sess_test")
      .orderBy(col("user_id"), col("session_seq")).collect()
    assert(out.length === 1, "only the closed session is emitted")
    val s = out.head
    assert(s.getAs[Long]("session_seq") === 1L)
    assert(s.getAs[Long]("n_events") === 3L,
      "batch-2 event within gap joins the batch-1 session")
    assert(s.getAs[Double]("session_value") === 6.0)
  }
}
