package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.AsOfJoinPhysical

/** The custom physical as-of join: plans as AsOfJoinExec, agrees with
  * the composed union+window rendering on randomized inputs, and
  * handles the no-match/null cases. */
class AsOfJoinPhysicalSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  test("plans through AsOfJoinExec with sorted co-partitioned children") {
    val l = Seq((1L, "k1", ts(1000))).toDF("lid", "k", "ts")
    val r = Seq((9L, "k1", ts(500))).toDF("rid", "k", "ts")
    val out = AsOfJoinPhysical.asOf(l, r, Seq("k"), "ts", "ts")
    val plan = out.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan rendering
    assert(plan.contains("AsOfJoin ["), s"custom exec missing:\n$plan")
    assert(plan.contains("ENSURE_REQUIREMENTS"),
      s"children not exchanged/co-partitioned:\n$plan")
    assert(out.select($"lid", $"r_rid").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 9L)))
  }

  test("matches the composed union+window as-of join on random inputs") {
    val gen = for {
      nL <- Gen.chooseNum(0, 40)
      nR <- Gen.chooseNum(0, 40)
      ls <- Gen.listOfN(nL, Gen.zip(
        Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0L, 5000L)))
      rs <- Gen.listOfN(nR, Gen.zip(
        Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0L, 5000L)))
    } yield (ls, rs)

    (0 until 6).foreach { i =>
      val (ls, rs) = gen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val left = ls.zipWithIndex
        .map { case ((k, t), id) => (id.toLong, k, ts(t)) }
        .toDF("lid", "k", "ts")
      // unique right (key, ts): the last-match tie among duplicate
      // right timestamps is unspecified in both renderings
      val right = rs.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, t), id) => (1000L + id, k, ts(t)) }
        .toDF("rid", "k", "rts")

      val viaExec = AsOfJoinPhysical.asOf(left, right, Seq("k"), "ts", "rts")
        .select($"lid", $"r_rid")
        .as[(Long, Option[Long])].collect().toMap
      val viaWindow = graft.operators.AsOfJoin.asOf(
        left, right, Seq("k"), "ts", "rts", Seq("rid"))
        .select($"lid", $"__match.rid")
        .as[(Long, Option[Long])].collect().toMap
      assert(viaExec === viaWindow, s"divergence at sample $i")
    }
  }

  test("left rows with no eligible right row get nulls") {
    val l = Seq((1L, "k1", ts(100)), (2L, "k2", ts(100))).toDF("lid", "k", "ts")
    val r = Seq((9L, "k1", ts(200))).toDF("rid", "k", "ts") // after both
    val out = AsOfJoinPhysical.asOf(l, r, Seq("k"), "ts", "ts")
      .select($"lid", $"r_rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(1L -> None, 2L -> None))
  }
}
