package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.TypeCensus
import graft.streaming.TypeCensus.{Census, Ev}

/** transformWithState (arbitrary-state v2): the per-user type census
  * must fold identically however the stream is batched, each key's
  * emission sequence must be monotone in n_events, and the operator's
  * RocksDB requirement is pinned (so the withRocksDb scoping in the
  * query body is load-bearing, not cargo cult). */
class TypeCensusSpec extends SparkSuite {
  import spark.implicits._

  private def runCensus(batches: Seq[Seq[Ev]]): Seq[Census] =
    TypeCensus.withRocksDb(spark) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val out = tmpDir("tws_census").toString
      val q = TypeCensus.censusStream(input.toDS())
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$out/_checkpoint")
        .foreachBatch { (b: Dataset[Census], _: Long) =>
          b.write.mode("append").parquet(s"$out/emissions")
        }
        .start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.read.parquet(s"$out/emissions").as[Census].collect().toSeq
    }

  private val all = Seq(
    Ev(1, "view"), Ev(1, "view"), Ev(1, "buy"),
    Ev(2, "view"), Ev(2, "buy"), Ev(2, "buy"),
    Ev(3, "view"))

  private def finalCensus(em: Seq[Census]): Map[Long, Census] =
    em.groupBy(_.user_id).map { case (u, cs) => u -> cs.maxBy(_.n_events) }

  test("drained census is batch-split invariant and equals the GROUP BY") {
    val oneBatch = runCensus(Seq(all))
    val threeBatches = runCensus(Seq(all.take(2), all.slice(2, 5), all.drop(5)))
    val want = Map(
      1L -> Census(1, 3, 2, "view", 2), // view 2 > buy 1
      2L -> Census(2, 3, 2, "buy", 2), // buy 2 > view 1
      3L -> Census(3, 1, 1, "view", 1))
    assert(finalCensus(oneBatch) === want)
    assert(finalCensus(threeBatches) === want)
  }

  test("ties break by type name, and emissions are monotone per key") {
    // user 9: one of each type → top is the lexicographically first
    val em = runCensus(Seq(
      Seq(Ev(9, "view")), Seq(Ev(9, "buy")), Seq(Ev(9, "add"))))
    assert(finalCensus(em)(9L) === Census(9, 3, 3, "add", 1))
    val ns = em.sortBy(_.n_events).map(_.n_events)
    assert(ns === Seq(1L, 2L, 3L), "one emission per batch, increasing")
  }

  test("the v2 operator requires the RocksDB state store") {
    // deliberately NOT wrapped in withRocksDb: the default HDFS-backed
    // provider cannot host multiple column families and must fail
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = tmpDir("tws_norocks").toString
    val q = TypeCensus.censusStream(input.toDS())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (b: Dataset[Census], _: Long) =>
        b.count(); () // consume fully — a no-op batch fn is itself an error
      }
      .start()
    input.addData(all)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination()
    }
    q.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m =>
      m.contains("RocksDB") || m.contains("column famil")),
      s"expected a state-store capability error, got: ${messages(err)}")
  }
}
