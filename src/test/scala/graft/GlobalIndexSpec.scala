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

  test("contiguity survives adversarial skew (90% duplicate order key)") {
    // order on k ALONE: the range exchange lands ~90% of rows in the
    // partition owning k=42 and leaves the rest near-empty (and with
    // more partitions than distinct values, some genuinely empty) —
    // the offset map must still yield a 1..n permutation (ties are
    // arbitrary but contiguous), and numbering must respect the order
    val n = 5000L
    val df = spark.range(n).select(
      when($"id" % 10 =!= 0, lit(42L)).otherwise($"id").as("k"), $"id")
    val got = GlobalIndex.withGlobalSeq(df, Seq(col("k")))
    val stats = got.agg(count(lit(1)), countDistinct($"global_seq"),
        min($"global_seq"), max($"global_seq"))
      .as[(Long, Long, Long, Long)].head()
    assert(stats === ((n, n, 1L, n)))
    val ks = got.select($"k", $"global_seq").as[(Long, Long)].collect()
      .sortBy(_._2).map(_._1)
    val violations = ks.sliding(2)
      .count(p => p.length == 2 && p(0) > p(1))
    assert(violations === 0, "k must be non-decreasing along the sequence")
  }

  test("degenerate inputs: empty frame and single row") {
    val empty = spark.range(0)
    assert(GlobalIndex.withGlobalSeq(empty.toDF(), Seq(col("id"))).count() === 0L)
    val one = GlobalIndex.withGlobalSeq(spark.range(1).toDF(), Seq(col("id")))
      .select($"global_seq").as[Long].head()
    assert(one === 1L)
  }

  test("global_csum equals a single-partition running sum") {
    // value = doc_id % 13 (skewed small longs); order total via doc_id
    val df = docs.withColumn("v", pmod($"doc_id", lit(13L)))
    val got = GlobalIndex.withGlobalCumSum(df,
        Seq($"source", $"doc_id"), $"v")
      .select($"doc_id", $"global_seq", $"global_csum")
    val w = Window.orderBy($"source", $"doc_id")
    val want = df.withColumn("global_seq", row_number().over(w).cast("long"))
      .withColumn("global_csum", sum($"v").over(w))
      .select($"doc_id", $"global_seq", $"global_csum")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("global_csum last value is the column total, first is its row") {
    val df = spark.range(1000).select($"id",
      (($"id" * 37L) % 101L).as("v"))
    val cs = GlobalIndex.withGlobalCumSum(df, Seq($"v".desc, $"id"), $"v")
    val total = df.agg(sum($"v")).as[Long].head()
    val (firstV, firstC) = cs.filter($"global_seq" === 1L)
      .select($"v", $"global_csum").as[(Long, Long)].head()
    assert(firstC === firstV)
    val lastC = cs.orderBy($"global_seq".desc).select($"global_csum")
      .as[Long].head()
    assert(lastC === total)
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
