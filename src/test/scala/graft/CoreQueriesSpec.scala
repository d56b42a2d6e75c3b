package graft

/** Smoke + spot checks for the verified query surface on sf0.001.
  * (The authoritative correctness gate is the DuckDB oracle compare —
  * BASELINE.md t2 — run via graft.Verify + tools/check.py.) */
class CoreQueriesSpec extends SparkSuite {

  test("every registered query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("top-k is correctly ordered and bounded") {
    val rows = SparkEntry.queries("q03_total_cost_per_customer")(spark, sf0001)
      .collect()
    assert(rows.length <= 10)
    val costs = rows.map(_.getAs[Double]("total_cost_usd")).toSeq
    assert(costs === costs.sorted.reverse, "descending by total cost")
  }

  test("dedup_latest yields unique keys") {
    val df = SparkEntry.queries("q10_dedup_latest")(spark, sf0001)
    assert(df.count() === df.select("user_id", "event_type").distinct().count())
  }
}
