package graft

import java.sql.Timestamp

import graft.operators.{AsOfJoin, SaltedJoin}

class OperatorSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: latest right at-or-before, per key, inclusive ties, null when none") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "B", ts("2024-01-01 09:00:00"))) // before any B quote
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0), // tie with trade 2 → inclusive
      ("B", ts("2024-01-01 12:00:00"), 50.0))
      .toDF("sym", "qts", "px")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "qts", Seq("px"))
      .selectExpr("trade_id", "__match.px AS px")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(100.0))
    assert(out(2L).contains(101.0), "equal timestamps match (at-or-before)")
    assert(out(3L).isEmpty, "no earlier quote -> null match")
  }

  test("salted join equals plain join") {
    val large = Tables.table(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
    val small = Tables.table(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey")
      .toDF("l_orderkey", "o_custkey") // rename to the shared key name
    val plain = large.join(small, Seq("l_orderkey")).count()
    val salted = SaltedJoin.inner(large, small, Seq("l_orderkey")).count()
    assert(salted === plain)
  }
}
