package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Checkpoint compatibility across a session repartition (r9 brief
  * #8): `spark.sql.shuffle.partitions` changing between RESTARTS of a
  * stateful stream must neither corrupt nor silently rebalance
  * existing state — Spark pins the stateful operator's partition
  * count in the checkpoint at first run, and every restart keeps
  * reading/writing state under THAT layout regardless of the session
  * setting. This is the story the state encodings (r8) and the
  * statestore reads (q210/q212) rely on: a cluster resize (new
  * executor count, new default parallelism) can never shift a key to
  * a store that doesn't hold its history.
  */
class StateRepartitionSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("n", LongType)))

  test("restart under a different shuffle.partitions keeps state layout and exactness") {
    val in = tmpDir("srp-in").toString
    val ckpt = tmpDir("srp-ckpt").toString
    val emit = tmpDir("srp-out").toString

    def feed(lo: Long, hi: Long, file: String): Unit =
      spark.range(lo, hi).select(($"id" % 50).as("user_id"), $"id".as("n"))
        .coalesce(1).write.mode("append").parquet(s"$in/$file")

    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$in/*")
        .groupBy($"user_id").agg(count(lit(1)).as("n_rows"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$emit/log")
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def statePartitionDirs(): Seq[String] = {
      val d = Paths.get(ckpt, "state", "0")
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString)
          .filter(_.forall(_.isDigit)) // skip _metadata
          .toSeq.sorted
      } finally s.close()
    }

    // first run under 8 state partitions
    graft.streaming.StreamTuning.withStatePartitions(spark, 8) {
      feed(0, 500, "b1"); drain()
    }
    val layout1 = statePartitionDirs()
    assert(layout1.size === 8, s"first run must create 8 stores: $layout1")

    // restart under a DIFFERENT session width — state must stay at 8
    graft.streaming.StreamTuning.withStatePartitions(spark, 3) {
      feed(500, 1200, "b2"); drain()
    }
    assert(statePartitionDirs() === layout1,
      "a restart must keep the checkpoint's state partitioning, " +
        "not rebalance to the new session width")

    // and the folded counts are exact: latest emission per user equals
    // the batch GROUP BY over everything fed
    val latest = spark.read.parquet(s"$emit/log")
      .groupBy($"user_id").agg(max($"n_rows").as("n_rows"))
    val expected = spark.read.schema(schema).parquet(s"$in/*")
      .groupBy($"user_id").agg(count(lit(1)).as("n_rows"))
    assert(latest.except(expected).isEmpty && expected.except(latest).isEmpty,
      "restarted stream diverged from the batch definition")
  }
}
