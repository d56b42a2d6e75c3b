package graft

import graft.text.Sampling

/** Deterministic hash sampling: partition-stable membership, nesting
  * across rates, stratum rate targeting. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("membership is a pure function of id: stable under repartition") {
    val docs = Tables.table(spark, sf0001, "documents")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").as[Long].collect().sorted.toSeq
    val a = ids(Sampling.hashSample(docs, "doc_id", 0.3))
    val b = ids(Sampling.hashSample(docs.repartition(13), "doc_id", 0.3))
    val c = ids(Sampling.hashSample(docs.coalesce(1), "doc_id", 0.3))
    assert(a === b && a === c)
  }

  test("samples nest: rate 0.1 is a subset of rate 0.3 at one salt") {
    val docs = Tables.table(spark, sf0001, "documents")
    def ids(rate: Double) =
      Sampling.hashSample(docs, "doc_id", rate)
        .select($"doc_id").as[Long].collect().toSet
    assert(ids(0.1).subsetOf(ids(0.3)))
    assert(ids(0.3).subsetOf(ids(1.0)))
    assert(ids(0.0).isEmpty)
  }

  test("different salts decorrelate draws") {
    val docs = Tables.table(spark, sf0001, "documents")
    def ids(salt: String) =
      Sampling.hashSample(docs, "doc_id", 0.5, salt)
        .select($"doc_id").as[Long].collect().toSet
    val x = ids("a"); val y = ids("b")
    assert(x !== y, "two salts should not select the same sample")
  }

  test("hashSplit partitions the corpus: disjoint, exhaustive, stable") {
    val docs = Tables.table(spark, sf0001, "documents")
    val (train, holdout) = Sampling.hashSplit(docs, "doc_id", 0.2)
    val t = train.select($"doc_id").as[Long].collect().toSet
    val h = holdout.select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert((t & h).isEmpty, "disjoint")
    assert((t | h) === all, "exhaustive")
    val (t2, _) = Sampling.hashSplit(docs.repartition(7), "doc_id", 0.2)
    assert(t2.select($"doc_id").as[Long].collect().toSet === t, "stable")
  }

  test("stratified rates land near their targets") {
    val docs = Tables.table(spark, sf0001, "documents")
    val total = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedHashSample(
      docs, "doc_id", "source",
      rates = Map("src0" -> 0.9), defaultRate = 0.2)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val src0Rate = sampled.getOrElse("src0", 0L).toDouble / total("src0")
    val restRate = (sampled - "src0").values.sum.toDouble /
      (total - "src0").values.sum
    assert(src0Rate > 0.6, s"src0 sampled at $src0Rate, want ≈0.9")
    assert(restRate > 0.05 && restRate < 0.4,
      s"default strata sampled at $restRate, want ≈0.2")
  }
}
