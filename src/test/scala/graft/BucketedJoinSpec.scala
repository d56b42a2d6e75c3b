package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed (SMB) join — the at-rest layout that deletes the join
  * shuffle entirely: both fact tables written `bucketBy(key)` into the
  * warehouse co-locate matching keys per bucket file, so the join
  * plans as a zero-exchange sort-merge over aligned buckets. This is
  * the 100 TB fact⋈fact answer SCALE.md promises ("co-locate joins via
  * bucketing"): the shuffle cost is paid ONCE at write time and
  * amortized over every subsequent join. Pinned here because the plan
  * property — no ShuffleExchange on either join side — is the entire
  * point and silently regresses if the write loses its bucket spec.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed fact-fact join plans with zero exchanges and matches the plain join") {
    import spark.implicits._
    // force the sort-merge path: at test scale the planner would
    // broadcast the small side and never exercise the bucket layout
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.table(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val ords = Tables.table(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_totalprice")
    val buckets = 8
    li.write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    ords.write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ords_b")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ords_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // matching bucket specs: the JOIN itself introduces no exchange;
      // the aggregation on the bucket key rides the same distribution,
      // so the whole plan is exchange-free
      assert(exchanges.isEmpty,
        s"expected zero exchanges, got:\n${joined.queryExecution.executedPlan}")
      val plain = li.join(ords, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      assert(joined.orderBy($"l_orderkey").collect().toSeq ==
        plain.orderBy($"l_orderkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ords_b")
    }
  }
}
