package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Sessionize

/** Property contract for the skew-resilient sessionize: for ANY input
  * (including a hot key holding most events, duplicate timestamps,
  * and boundary-exact gaps) and ANY chunk length (shorter than the
  * gap, equal, longer, non-divisor), [[Sessionize.chunked]] produces
  * exactly [[Sessionize.plain]]'s result.
  */
class SessionizeChunkedSpec extends SparkSuite {
  import spark.implicits._

  private val gapMicros = 100L * 1000000L // 100 s

  /** Skewed generator: ~70% of events on the hot key; timestamps are
    * multiples of gap/4 so exact-gap boundaries occur often; a few
    * duplicate (key, ts) pairs force tie-breaking through event_id. */
  private val eventsGen: Gen[List[(String, Long, Long, Double)]] = for {
    n <- Gen.chooseNum(30, 120)
    rows <- Gen.listOfN(n, for {
      hot <- Gen.prob(0.7)
      key <- if (hot) Gen.const("hot") else Gen.oneOf("u1", "u2", "u3")
      slot <- Gen.chooseNum(0L, 400L)
      v <- Gen.chooseNum(0, 9999)
    } yield (key, slot * (gapMicros / 4), v / 100.0))
  } yield rows.zipWithIndex.map { case ((k, ts, v), i) => (k, i.toLong, ts, v) }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(7L + i)))

  private def canon(rows: Array[Row]): Seq[(String, Long, Long, Long, Long, Double)] =
    rows.map(r => (String.valueOf(r.get(0)), r.getLong(1),
      r.getTimestamp(2).getTime, r.getTimestamp(3).getTime,
      r.getLong(4), r.getDouble(5))).toSeq.sorted

  test("chunked == plain for skewed inputs across chunk lengths") {
    val chunkLens = Seq(
      gapMicros / 3,       // chunks shorter than the gap
      gapMicros,           // equal
      7L * gapMicros / 2,  // longer, non-divisor of the slot grid
      50L * gapMicros)     // one chunk swallows everything
    samples(eventsGen, 6).foreach { rows =>
      val df = rows.toDF("user_id", "event_id", "us", "value")
        .selectExpr("user_id", "event_id",
          "timestamp_micros(us) AS ts", "value")
      val expected = canon(Sessionize.plain(
        df, "user_id", "ts", "event_id", "value", gapMicros).collect())
      chunkLens.foreach { cl =>
        val got = canon(Sessionize.chunked(
          df, "user_id", "ts", "event_id", "value", gapMicros, cl).collect())
        assert(got === expected, s"chunkMicros=$cl diverged from plain")
      }
    }
  }

  test("chunked matches q23's registered sessionize on real events (sf0.001)") {
    val events = Tables.table(spark, sf0001, "events")
      .select("user_id", "event_id", "ts", "value")
    val plain = canon(Sessionize.plain(
      events, "user_id", "ts", "event_id", "value", 1800000000L).collect())
    val chunked = canon(Sessionize.chunked(
      events, "user_id", "ts", "event_id", "value", 1800000000L,
      chunkMicros = 6L * 3600L * 1000000L).collect())
    assert(chunked === plain)
  }
}
