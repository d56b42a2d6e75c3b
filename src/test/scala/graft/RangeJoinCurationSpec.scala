package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.text.Curation

/** Banded range join: equals the naive theta-join on every band
  * boundary case; curation: each gate drops exactly what its rule
  * says. */
class RangeJoinCurationSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("timeRange matches the naive range predicate incl. band edges") {
    // events straddling band boundaries (width = 60s window)
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:01:00")),
      (2L, "u1", ts("2024-01-01 10:02:00")),
      (3L, "u2", ts("2024-01-01 10:01:30")))
      .toDF("lid", "user", "ts")
    val right = Seq(
      (10L, "u1", ts("2024-01-01 10:00:00")), // exactly -60s from lid 1
      (11L, "u1", ts("2024-01-01 10:00:59")),
      (12L, "u1", ts("2024-01-01 10:02:00")), // equal ts to lid 2
      (13L, "u2", ts("2024-01-01 10:00:31")),
      (14L, "u2", ts("2024-01-01 10:00:29"))) // 61s before lid 3: out
      .toDF("rid", "user", "rts")

    val got = RangeJoin.timeRange(left, right, Seq("user"),
      leftTs = "ts", rightTs = "rts", before = 60L, after = 0L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet

    val want = left.as[(Long, String, Timestamp)].collect().flatMap { l =>
      right.as[(Long, String, Timestamp)].collect().collect {
        case r if r._2 == l._2 &&
          r._3.getTime >= l._3.getTime - 60000 &&
          r._3.getTime <= l._3.getTime => (l._1, r._1)
      }
    }.toSet
    assert(got === want)
    assert(got.contains((1L, 10L)), "inclusive lower bound")
    assert(got.contains((2L, 12L)), "inclusive upper bound (equal ts)")
    assert(!got.contains((3L, 14L)), "outside window excluded")
  }

  test("property: banded join equals naive predicate on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      before <- Gen.chooseNum(1L, 120L)
      after <- Gen.chooseNum(0L, 120L)
      band <- Gen.oneOf(0L, 7L, 30L, 500L) // 0 = default width
      ls <- Gen.listOfN(25, Gen.zip(Gen.oneOf("u1", "u2"), Gen.chooseNum(0L, 600L)))
      rs <- Gen.listOfN(25, Gen.zip(Gen.oneOf("u1", "u2"), Gen.chooseNum(0L, 600L)))
    } yield (before, after, band, ls, rs)
    (0 until 8).foreach { i =>
      val (before, after, band, ls, rs) =
        gen.pureApply(Gen.Parameters.default, Seed(11L + i))
      val base = 1700000000000L
      val left = ls.zipWithIndex.map { case ((u, t), id) =>
        (id.toLong, u, new Timestamp(base + t * 1000)) }.toDF("lid", "user", "ts")
      val right = rs.zipWithIndex.map { case ((u, t), id) =>
        (100L + id, u, new Timestamp(base + t * 1000)) }.toDF("rid", "user", "rts")
      val got = RangeJoin.timeRange(left, right, Seq("user"),
        "ts", "rts", before, after, bandSeconds = band)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val want = (for {
        ((lu, lt), lid) <- ls.zipWithIndex
        ((ru, rt), rid) <- rs.zipWithIndex
        if lu == ru && rt >= lt - before && rt <= lt + after
      } yield (lid.toLong, 100L + rid)).toSet
      assert(got === want, s"sample $i (before=$before after=$after band=$band)")
    }
  }

  test("curate applies quality, exact-dup, and near-dup gates in order") {
    val good = ("w" + (1 to 80).map(i => s"the w$i").mkString(" ", " ", ""))
    val docs = Seq(
      (1L, "s1", good),                    // survives
      (2L, "s1", good),                    // exact dup of 1 -> dropped
      (3L, "s1", good + " extraword"),     // near-dup of 1 -> dropped
      (4L, "s2", "tiny doc"),              // low quality -> dropped
      (5L, "s2", ("x" + (1 to 90).map(i => s"of q$i").mkString(" ", " ", ""))))
      .toDF("doc_id", "source", "text")
    val out = Curation.curate(docs, "doc_id", "text",
      minQuality = 0.45, nearDupThreshold = 0.8)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(1L, 5L))

    val stats = Curation.sourceStats(
      Curation.curate(docs, "doc_id", "text", 0.45, 0.8), "source", "text")
      .orderBy($"source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(stats.map(s => (s._1, s._2)) === Seq(("s1", 1L), ("s2", 1L)))
  }
}
