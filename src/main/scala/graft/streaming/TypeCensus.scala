package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, Trigger}

import graft.Tables
import graft.queries.Q

/** Per-user event-type census through `transformWithState` — the
  * arbitrary-state v2 streaming operator (Spark 4's successor to
  * flatMapGroupsWithState, used by q41/q61): a [[StatefulProcessor]]
  * with a typed, named [[MapState]] per key. What v2 adds over the
  * single-blob GroupState the engine's other stateful surfaces use:
  * composable named state variables (a map per user here — point
  * get/put per arriving type, no read-modify-write of one serialized
  * blob), per-state TTL configs, and timers — the API a long-running
  * 100 TB keyed monitor actually wants, with state in RocksDB
  * (REQUIRED by the operator: off-heap per-partition stores, the
  * RocksDbStateSpec story) rather than executor heap.
  *
  * Census semantics: per user, the running per-type event counts;
  * each micro-batch emits the user's updated census (Update mode).
  * Counts are commutative, so the DRAINED census is arrival-order
  * free and the DuckDB oracle replays it as a batch GROUP BY —
  * the same contract every streaming surface here verifies under.
  */
object TypeCensus {
  private val runId = new AtomicInteger(0)

  case class Ev(user_id: Long, event_type: String)
  case class Census(user_id: Long, n_events: Long, n_types: Long,
      top_type: String, top_n: Long)

  /** Keyed processor: MapState[event_type → count]. Emissions build
    * the top entry with a total tie-break (count desc, then type), so
    * the census is deterministic however batches split. */
  class CensusProcessor extends StatefulProcessor[Long, Ev, Census] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Census] = {
      var touched = false
      rows.foreach { e =>
        val cur =
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L
        counts.updateValue(e.event_type, cur + 1L)
        touched = true
      }
      if (!touched) Iterator.empty
      else {
        val m = counts.iterator().toSeq
        val top = m.minBy { case (t, c) => (-c, t) }
        Iterator.single(
          Census(key, m.map(_._2).sum, m.size.toLong, top._1, top._2))
      }
    }
  }

  /** The v2 operator needs the RocksDB state store; scope the
    * provider to the stream and restore the session default after. */
  private[graft] def withRocksDb[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The transform itself, factored for the multi-batch MemoryStream
    * spec: events keyed by user through the census processor. */
  def censusStream(events: Dataset[Ev]): Dataset[Census] = {
    implicit val censusEnc: org.apache.spark.sql.Encoder[Census] =
      Encoders.product[Census]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new CensusProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Drain the events table as a stream, fold emissions, return the
    * final census per user. A user's n_events strictly increases
    * across its emissions (a batch with none of the user's rows emits
    * nothing), so "latest" = max n_events — picked with a bounded
    * per-user window over the emission log. */
  def streamedCensus(spark: SparkSession, dir: String): DataFrame =
    StreamTuning.withStatePartitions(spark) { withRocksDb(spark) {
      import spark.implicits._
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_tws_${runId.incrementAndGet()}_")
        .toString
      val q = censusStream(
        Tables.eventsStream(spark, dir)
          .select(col("user_id"), col("event_type")).as[Ev])
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$out/_checkpoint")
        .foreachBatch { (b: Dataset[Census], _: Long) =>
          b.write.mode("append").parquet(s"$out/emissions")
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val em = spark.read.parquet(s"$out/emissions")
      em.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"n_events".desc)))
        .filter($"rn" === 1).drop("rn")
        .orderBy($"user_id")
    }}

  /** The custom DSv2 source feeding the newest stateful operator —
    * end-to-end composition: events re-shard into the graftlog
    * format, stream back out through [[graft.sources.GraftLogSource]]
    * under admission control (2 shards per micro-batch → a REAL
    * multi-batch drain, unlike the single-file parquet stream), and
    * fold through the same transformWithState census. The census is
    * batch-split invariant (TypeCensusSpec), so the drained result
    * still equals the batch GROUP BY whatever the admission knob —
    * which is exactly what the shared oracle checks. */
  def graftlogStreamedCensus(spark: SparkSession, dir: String): DataFrame =
    StreamTuning.withStatePartitions(spark) { withRocksDb(spark) {
      import spark.implicits._
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_tws_gl_${runId.incrementAndGet()}_")
        .toString
      // read-only drain over the shared ingest (fresh checkpoint per
      // run — the drain result only depends on the bounded input)
      val log = graft.queries.GlogFixtures.eventsLog(spark, dir, 8)
      val q = censusStream(
        spark.readStream.format("graft.sources.GraftLogSource")
          .option("maxShardsPerTrigger", "2").load(log)
          .select(col("user_id"), col("event_type")).as[Ev])
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$out/_checkpoint")
        .foreachBatch { (b: Dataset[Census], _: Long) =>
          b.write.mode("append").parquet(s"$out/emissions")
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val em = spark.read.parquet(s"$out/emissions")
      em.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"n_events".desc)))
        .filter($"rn" === 1).drop("rn")
        .orderBy($"user_id")
    }}

  val queries: Map[String, Q.Fn] = Map(
    "q168_stream_type_census" -> ((s, dir) => streamedCensus(s, dir)),
    "q172_graftlog_stream_census" ->
      ((s, dir) => graftlogStreamedCensus(s, dir)))

  private val censusOracle =
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
                    FROM events GROUP BY user_id, event_type),
            a AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
                         CAST(count(*) AS BIGINT) AS n_types
                  FROM c GROUP BY user_id),
            t AS (SELECT user_id, event_type AS top_type,
                         CAST(c AS BIGINT) AS top_n,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY c DESC, event_type) AS rn
                  FROM c)
         SELECT a.user_id, n_events, n_types, top_type, top_n
         FROM a JOIN t ON a.user_id = t.user_id AND t.rn = 1
         ORDER BY a.user_id"""

  val oracles: Map[String, String] = Map(
    "q168_stream_type_census" -> censusOracle,
    "q172_graftlog_stream_census" -> censusOracle)
}
