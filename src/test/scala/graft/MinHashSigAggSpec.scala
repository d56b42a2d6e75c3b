package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MinHashSigAgg}
import graft.text.TextFunctions

/** The custom TypedImperativeAggregate: constant-size group MinHash
  * signatures whose agreement fraction estimates exact set jaccard. */
class MinHashSigAggSpec extends SparkSuite {
  import spark.implicits._

  test("signature agreement tracks exact per-source jaccard") {
    GraftFunctions.register(spark)
    val sh = Tables.table(spark, sf0001, "documents")
      .select($"source", explode(TextFunctions.shingles($"text", 2)).as("sh"))
    val sigs = sh.groupBy($"source")
      .agg(expr("graft_minhash_sig(sh)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val exact = SparkEntry.queries("q54_source_overlap")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

    assert(sigs.size === 20)
    assert(sigs.values.forall(_.length === 64))
    // estimate within 0.25 of exact for every pair (k=64 → sd ≈ 0.06)
    val errs = exact.map { case ((a, b), j) =>
      math.abs(MinHashSigAgg.estimateJaccard(sigs(a), sigs(b)) - j)
    }
    assert(errs.max < 0.25, s"max estimation error ${errs.max}")
    assert(errs.sum / errs.size < 0.1, s"mean error ${errs.sum / errs.size}")
  }

  test("signatures merge associatively across partition layouts") {
    GraftFunctions.register(spark)
    val sh = Tables.table(spark, sf0001, "documents")
      .select($"source", explode(TextFunctions.shingles($"text", 2)).as("sh"))
    def sigWith(parts: Int) = sh.repartition(parts)
      .groupBy($"source").agg(expr("graft_minhash_sig(sh)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(sigWith(1) === sigWith(7), "partitioning must not change result")
  }
}
