package graft

/** Co-located join via bucketing: two tables bucketed+sorted on the
  * join key join with NO shuffle exchange — the "pre-partition big
  * joins" scale technique (SURVEY.md §1.5 / SCALE.md). */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed tables join without Exchange; result matches plain join") {
    val base = tmpDir("buckets")
    val li = Tables.table(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
    val ord = Tables.table(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", base.resolve("li").toString).saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", base.resolve("ord").toString).saveAsTable("ord_bucketed")

    // force the sort-merge path: at real scale neither side broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          $"l_orderkey" === $"o_orderkey")
        .filter($"l_extendedprice" > 0.0)
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(n === li.join(ord, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
