package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-prefiltered semi join: exactness vs the plain join, real
  * pruning at the scan, and the filter-as-literal plan shape. */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val li = Tables.table(spark, sf0001, "lineitem")
  private lazy val smallParts =
    Tables.table(spark, sf0001, "part").filter($"p_size" <= 5)

  test("bloom semi join ≡ plain semi join (false positives removed)") {
    val got = BloomJoin.semiJoin(li, "l_partkey", smallParts, "p_partkey",
        expectedItems = 1 << 12, fpp = 0.05)
      .select($"l_orderkey", $"l_partkey", $"l_linenumber")
      .as[(Long, Long, Long)].collect().toSet
    val want = li.join(smallParts,
        li("l_partkey") === smallParts("p_partkey"), "leftsemi")
      .select($"l_orderkey", $"l_partkey", $"l_linenumber")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture must exercise the join")
  }

  test("no false negatives even at a sloppy fpp") {
    val got = BloomJoin.semiJoin(li, "l_partkey", smallParts, "p_partkey",
        expectedItems = 64, fpp = 0.5) // deliberately undersized
      .count()
    val want = li.join(smallParts,
        li("l_partkey") === smallParts("p_partkey"), "leftsemi").count()
    assert(got === want, "bloom can never drop a true match")
  }

  test("the probe prunes most non-matching rows before the join") {
    val bytes = BloomJoin.buildFilterBytes(
      smallParts, "p_partkey", 1 << 12, 0.01)
    val pre = li.filter(call_function("graft_bloom_might_contain",
      $"l_partkey".cast("long"), lit(bytes)))
    val total = li.count()
    val kept = pre.count()
    val trueMatches = li.join(smallParts,
      li("l_partkey") === smallParts("p_partkey"), "leftsemi").count()
    assert(kept >= trueMatches, "no false negatives")
    assert(kept < total / 2,
      s"probe kept $kept of $total — not pruning (true matches: $trueMatches)")
    // the probe appears in the plan as a codegen'd filter, not a UDF
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("graftbloommightcontain") ||
      plan.toLowerCase.contains("bloommightcontain"), plan.take(2000))
  }

  test("non-integral keys are rejected (would hash differently -> false negatives)") {
    val stringKeyed = smallParts.selectExpr("cast(p_partkey as string) AS k")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(
        li.selectExpr("cast(l_partkey as string) AS k"), "k",
        stringKeyed, "k")
    }
    assert(e.getMessage.contains("integral key"))
  }

  test("null keys never pass the probe") {
    val bytes = BloomJoin.buildFilterBytes(
      smallParts, "p_partkey", 1 << 12, 0.01)
    val df = Seq(Some(1L), None, Some(2L)).toDF("k")
      .filter(call_function("graft_bloom_might_contain", $"k", lit(bytes)))
    assert(df.as[Option[Long]].collect().forall(_.isDefined))
  }
}
