package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalIndex

/** GlobalIndex: contiguous global sequence without a one-partition
  * window — the assigned numbers must equal the row's rank in the
  * total order (so they are independent of partition boundaries), be
  * a permutation of 1..n, and cut into exactly-sized shards. */
class GlobalIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.table(spark, sf0001, "documents")
    .select($"doc_id", $"source")

  test("global_seq equals row_number over the same total order") {
    val got = GlobalIndex.withGlobalSeq(docs, Seq($"source", $"doc_id"))
      .select($"doc_id", $"global_seq")
    val want = docs.withColumn("global_seq",
        row_number().over(Window.orderBy($"source", $"doc_id")).cast("long"))
      .select($"doc_id", $"global_seq")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("sequence is a contiguous permutation of 1..n") {
    val n = docs.count()
    val seq = GlobalIndex.withGlobalSeq(docs, Seq($"doc_id"))
      .agg(count(lit(1)), countDistinct($"global_seq"),
        min($"global_seq"), max($"global_seq"))
      .as[(Long, Long, Long, Long)].head()
    assert(seq === ((n, n, 1L, n)))
  }

  test("fixed-size shards: every shard but the last has exactly k rows") {
    val k = 7L
    val shards = GlobalIndex.withGlobalSeq(docs, Seq($"doc_id"))
      .select(expr(s"CAST((global_seq - 1) DIV $k AS BIGINT)").as("shard"))
      .groupBy($"shard").count()
      .orderBy($"shard")
      .as[(Long, Long)].collect()
    val n = docs.count()
    val full = n / k
    assert(shards.take(full.toInt).forall(_._2 == k))
    if (n % k != 0) assert(shards.last._2 == n % k)
  }
}
