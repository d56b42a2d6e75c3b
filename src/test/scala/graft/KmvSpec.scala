package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.text.TextFunctions

/** KMV bottom-k sketch (KmvAgg) contract:
  *  - the evaluated sketch is exactly the k smallest DISTINCT input
  *    values, regardless of arrival order or partitioning (order-free
  *    min-k ⇒ merge-invariant ⇒ oracle-replayable);
  *  - the q162 pair estimator tracks exact Jaccard within the
  *    ±O(1/√k) envelope on the real corpus.
  */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  test("sketch = k smallest distinct values, invariant to partitioning") {
    GraftFunctions.register(spark)
    // duplicated, shuffled input: values 0..999 each twice, plus a
    // spread of large values that must never displace the bottom k
    val vals = scala.util.Random.shuffle(
      ((0L until 1000L) ++ (0L until 1000L) ++
        (100000L until 100500L)).toVector)
    val expected = (0L until 256L).toArray
    for (parts <- Seq(1, 3, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(expr("graft_kmv(v, 256)")).head.getSeq[Long](0).toArray
      assert(got.sameElements(expected), s"parts=$parts")
    }
  }

  test("sketch shorter than k when the distinct universe is smaller") {
    val got = Seq(5L, 5L, 3L, 3L, 9L).toDF("v")
      .agg(expr("graft_kmv(v, 256)")).head.getSeq[Long](0)
    assert(got === Seq(3L, 5L, 9L))
  }

  test("q162 estimate tracks exact jaccard within the k=256 envelope") {
    val rows = SparkEntry.queries("q162_kmv_source_overlap")(spark, sf0001)
      .collect()
    assert(rows.length === 20 * 19 / 2)
    // sd of the estimator ≈ √(J(1−J)/k) ≤ 0.031 at k=256; allow 4 sd
    // in per-mille. err_pm is integer (est_pm − jacc_pm).
    val worst = rows.map(r => math.abs(r.getAs[Long]("err_pm"))).max
    assert(worst <= 125L, s"worst |err_pm| = $worst")
  }

  test("pair legs agree with q54's exact double-precision jaccard") {
    // jacc_pm must be the per-mille floor of q54's double jaccard
    val exact = SparkEntry.queries("q54_source_overlap")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    SparkEntry.queries("q162_kmv_source_overlap")(spark, sf0001)
      .collect().foreach { r =>
        val j = exact((r.getAs[String]("src_a"), r.getAs[String]("src_b")))
        assert(r.getAs[Long]("jacc_pm") === math.floor(j * 1000).toLong)
      }
  }
}
