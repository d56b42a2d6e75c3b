package graft

import org.apache.spark.sql.functions._

/** CBO statistics surface (r12 brief #5): ANALYZE TABLE feeds the
  * planner — a selective join flips from shuffle to broadcast ONLY
  * once column stats exist (without them the filtered side prices at
  * raw file size), and the recorded stats are exact where exactness
  * is promised (rowCount, min/max, nullCount).
  */
class CboStatsSpec extends SparkSuite {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE flips a selective join to broadcast; stats are exact") {
    val suffix = System.nanoTime()
    val cust = s"cbo_cust_$suffix"
    val ords = s"cbo_ord_$suffix"
    spark.catalog.createTable(cust, "parquet",
      Map("path" -> s"$sf0001/customer.parquet"))
    spark.catalog.createTable(ords, "parquet",
      Map("path" -> s"$sf0001/orders.parquet"))
    val nCust = spark.table(cust).count()
    val sql =
      s"""SELECT o.o_orderkey, c.c_name FROM $ords o
          JOIN $cust c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey = ${nCust / 2}"""
    def planHasBroadcast: Boolean = withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      spark.sql(sql).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin")
    }
    assert(!planHasBroadcast,
      "without stats the filtered side prices at raw file size — no broadcast")
    spark.sql(s"ANALYZE TABLE $cust COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql(s"ANALYZE TABLE $ords COMPUTE STATISTICS")
    assert(planHasBroadcast,
      "with column stats the equality filter prices at ~1 row — broadcast")
    // exactness: rowCount, min/max, nullCount are exact after ANALYZE
    val (realMin, realMax) = spark.table(cust)
      .agg(min($"c_custkey"), max($"c_custkey")).as[(Long, Long)].head()
    val stats = spark.sql(s"DESC EXTENDED $cust c_custkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats("min") === realMin.toString)
    assert(stats("max") === realMax.toString)
    assert(stats("num_nulls") === "0")
    val tableStats = spark.sql(s"DESC EXTENDED $cust").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tableStats("Statistics").contains(s"$nCust rows"),
      s"Statistics row: ${tableStats("Statistics")}")
    spark.sql(s"DROP TABLE $cust")
    spark.sql(s"DROP TABLE $ords")
  }
}
