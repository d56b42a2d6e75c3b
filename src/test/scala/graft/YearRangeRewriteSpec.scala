package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** The optimizer rule must (a) preserve semantics and (b) actually
  * reach the parquet scan as a pushed range filter. */
class YearRangeRewriteSpec extends SparkSuite {
  import spark.implicits._

  test("year(cast(ts as date)) = N becomes a pushed range, same rows") {
    GraftExtensions.install(spark)
    val orders = Tables.table(spark, sf0001, "orders")

    val viaYear = orders
      .filter(year($"o_orderdate".cast("date")) === 1996)
      .select($"o_orderkey")
    val viaRange = orders
      .filter($"o_orderdate" >= to_timestamp_ntz(lit("1996-01-01")) &&
        $"o_orderdate" < to_timestamp_ntz(lit("1997-01-01")))
      .select($"o_orderkey")
    assert(viaYear.collect().map(_.getLong(0)).sorted.toSeq ===
      viaRange.collect().map(_.getLong(0)).sorted.toSeq)

    val physical = viaYear.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(o_orderdate"),
      s"range lower bound not pushed:\n$physical")
    assert(physical.contains("LessThan(o_orderdate"),
      s"range upper bound not pushed:\n$physical")
  }

  test("year() on a plain date column is rewritten too") {
    GraftExtensions.install(spark)
    val df = Seq(
      ("2023-12-31", 1), ("2024-01-01", 2), ("2024-12-31", 3), ("2025-01-01", 4))
      .toDF("d", "n")
      .select($"d".cast("date").as("d"), $"n")
    val got = df.filter(year($"d") === 2024).select($"n")
      .as[Int].collect().sorted.toSeq
    assert(got === Seq(2, 3), "boundary days classified correctly")
  }

  test("null dates stay excluded (null semantics preserved)") {
    GraftExtensions.install(spark)
    val df = Seq(Some("2024-06-01"), None).toDF("ds")
      .select($"ds".cast("date").as("d"))
    assert(df.filter(year($"d") === 2024).count() === 1)
  }

  test("property: TIMESTAMP rewrite matches year() across DST zones") {
    // the rule derives its range literals from the SESSION time zone
    // (rangeFor → SQLConf.sessionLocalTimeZone); a zone where legal
    // time shifts around new year is exactly where a UTC-offset slip
    // would misclassify boundary instants. Pacific/Apia skipped an
    // entire day (30 Dec 2011); Pacific/Kiritimati skipped 31 Dec
    // 1994; the others have ordinary DST but non-integral or negative
    // offsets at midnight Jan 1.
    GraftExtensions.install(spark)
    val zones = Seq("UTC", "America/New_York", "Australia/Lord_Howe",
      "Pacific/Apia", "Pacific/Kiritimati", "America/Santiago")
    val years = Seq(1995, 2011, 2012, 2024)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (z <- zones) {
        spark.conf.set("spark.sql.session.timeZone", z)
        val zone = java.time.ZoneId.of(z)
        // instants bracketing each year boundary by ±50 h in 7h steps
        val instants = for {
          y <- years
          base = java.time.LocalDate.of(y, 1, 1).atStartOfDay(zone)
            .toInstant.getEpochSecond
          off <- -50L * 3600 to 50L * 3600 by 7 * 3600
        } yield base + off
        val df = instants.toDF("epoch")
          .select(timestamp_seconds($"epoch").as("ts"), $"epoch")
        for (y <- years) {
          val got = df.filter(year($"ts") === y)
            .select($"epoch").as[Long].collect().sorted.toSeq
          val want = instants.filter(e =>
            java.time.Instant.ofEpochSecond(e).atZone(zone).getYear == y)
            .sorted
          assert(got === want, s"zone=$z year=$y")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
