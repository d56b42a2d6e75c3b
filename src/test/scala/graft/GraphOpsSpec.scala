package graft

import graft.queries.OperatorQueries

/** q226 k-core and q227 label propagation: the fixed-round unrolling
  * both queries share with their DuckDB oracles is only honest if the
  * iteration has actually converged — these pin that, plus the
  * invariants (core degrees ≥ k; the community census partitions the
  * node set) that hold regardless of the data.
  */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  test("6 peel rounds reach the k=3 core fixpoint on sf0.001") {
    def run(rounds: Int): Seq[(Long, Long)] =
      OperatorQueries.kcore(spark, sf0001, k = 3, rounds = rounds)
        .as[(Long, Long)].collect().toSeq
    val r6 = run(6)
    assert(r6.nonEmpty, "3-core unexpectedly empty")
    // fixpoint: one more peel round changes nothing
    assert(run(7) === r6)
    // core invariant: every surviving node keeps degree ≥ k inside it
    assert(r6.forall(_._2 >= 3L),
      s"node below k in claimed core: ${r6.filter(_._2 < 3L).take(3)}")
  }

  test("label-propagation census partitions the node set exactly") {
    val nNodes = OperatorQueries.purchaseEdges(spark, sf0001)
      .select("src").distinct().count()
    val census = SparkEntry.queries("q227_label_prop")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(census.map(_._2).sum === nNodes,
      "community sizes must sum to |V| — labels lost or duplicated")
    // deterministic under re-execution (synchronous rounds + total
    // tie-break leave nothing to partitioning)
    val again = SparkEntry.queries("q227_label_prop")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(again === census)
  }
}
