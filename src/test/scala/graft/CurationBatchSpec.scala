package graft

import org.apache.spark.sql.functions._

/** Contracts for the r8 curation/analytics batch (q180–q184). Row
  * nonemptiness and plan hygiene are covered registry-wide by
  * CoreQueriesSpec/PlanAuditSpec; these pin the operator-specific
  * invariants the DuckDB hash alone doesn't spell out.
  */
class CurationBatchSpec extends SparkSuite {
  import spark.implicits._

  test("q180 segment membership plans as a left-semi join") {
    val plan = SparkEntry.queries("q180_shipping_priority")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"expected customer membership as LeftSemi, got:\n$plan")
  }

  test("q181 aggregates lineitem BEFORE joining orders") {
    // the HAVING-membership must shuffle lineitem once (aggregate
    // first), never join the wide fact-fact frame and aggregate that
    val df = SparkEntry.queries("q181_big_order_customers")(spark, sf0001)
    val lp = df.queryExecution.optimizedPlan
    // walk: every Aggregate over lineitem must sit BELOW any Join
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val joins = lp.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val aggUnderJoin = joins.exists(_.collect {
      case a: Aggregate => a }.nonEmpty)
    assert(aggUnderJoin, "quantity aggregate must be a join INPUT")
    // and the threshold holds on every output row
    val qtys = df.select($"total_qty").as[Double].collect()
    assert(qtys.nonEmpty && qtys.forall(_ > 250.0))
  }

  test("q182 every pair is distinct with a non-negative margin") {
    val rows = SparkEntry.queries("q182_preference_pairs")(spark, sf0001)
      .select($"chosen_id", $"rejected_id", $"chosen_score",
        $"rejected_score", $"n_docs")
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, r, cs, rs, n) =>
      assert(n >= 2)
      assert(c != r, s"chosen == rejected ($c) in a group of $n")
      assert(cs >= rs, s"chosen $cs < rejected $rs")
    }
  }

  test("q183 flattens the length distribution to the rarest bucket") {
    val accepted = SparkEntry.queries("q183_length_matched_resample")(
      spark, sf0001)
    val perBucket = accepted.groupBy($"len_bucket")
      .agg(count(lit(1)).as("n_acc"),
        first($"n_bucket").as("n_bucket"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(perBucket.nonEmpty)
    val m = perBucket.map(_._3).min
    perBucket.foreach { case (b, nAcc, nBucket) =>
      assert(nAcc <= nBucket)
      // the rarest bucket is kept whole (acceptance ratio 1)...
      if (nBucket == m) assert(nAcc == nBucket,
        s"min bucket $b lost rows: $nAcc of $nBucket")
      // ...and no bucket keeps more than ~4× the target mass (the
      // hash test is uniform; 4× on these sizes is far beyond any
      // deviation a correct filter can produce)
      assert(nAcc <= 4 * m + 4, s"bucket $b kept $nAcc, target $m")
    }
    // determinism: same membership on a re-run
    val a1 = accepted.select($"doc_id").as[Long].collect().toSeq
    val a2 = SparkEntry.queries("q183_length_matched_resample")(
      spark, sf0001).select($"doc_id").as[Long].collect().toSeq
    assert(a1 == a2)
  }

  test("q184 incremental view merge == one-shot recompute") {
    val inc = SparkEntry.queries("q184_delta_view_maintenance")(
      spark, sf0001)
    val cust = Tables.table(spark, sf0001, "customer")
      .select($"c_custkey", $"c_nationkey")
    val nat = Tables.table(spark, sf0001, "nation")
      .select($"n_nationkey", $"n_name")
    val full = Tables.table(spark, sf0001, "orders")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum($"o_totalprice".cast("decimal(18,4)")).cast("double")
        .as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"n_name")
    assert(inc.as[(String, Double, Long)].collect().toSeq ==
      full.as[(String, Double, Long)].collect().toSeq)
  }
}
