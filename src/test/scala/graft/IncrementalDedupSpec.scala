package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Incremental (batch-vs-corpus) near-dup: equals the brute-force
  * cross-side model, and never emits a same-side pair. */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  test("incrementalNearDupPairs equals the brute-force cross model") {
    val docs = Tables.table(spark, sf0001, "documents")
    val corpus = docs.filter($"source" === "src0")
    val batch = docs.filter($"source" =!= "src0")
    val threshold = 0.5 // permissive so the tiny fixture yields pairs

    val got = Dedup.incrementalNearDupPairs(
        corpus, batch, "doc_id", "text", threshold)
      .select($"batch_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet

    val cs = corpus.select($"doc_id".as("corpus_id"),
      TextFunctions.shingles($"text", 3).as("sh_c"))
    val bs = batch.select($"doc_id".as("batch_id"),
      TextFunctions.shingles($"text", 3).as("sh_b"))
    val want = bs.crossJoin(cs)
      .withColumn("jaccard", Dedup.jaccard($"sh_b", $"sh_c"))
      .filter($"jaccard" >= threshold)
      .select($"batch_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet

    assert(got === want)

    val corpusIds = corpus.select($"doc_id").as[Long].collect().toSet
    val batchIds = batch.select($"doc_id").as[Long].collect().toSet
    got.foreach { case (b, c, _) =>
      assert(batchIds.contains(b) && corpusIds.contains(c),
        s"pair ($b,$c) crosses sides")
    }
  }
}
