package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions
import graft.vector.VectorFunctions

/** Semantic checks for the LLM-pipeline operators (the hash-match
  * gate is the DuckDB oracle; these pin the properties the oracle
  * can't express). */
class TextVectorSpec extends SparkSuite {
  import spark.implicits._

  test("shingles: distinct n-grams, empty for short docs") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y x y x y"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextFunctions.shingles($"text", 3).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("a b c", "b c d"))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq("x y x", "y x y"), "distinct keeps first occurrence")
  }

  test("minhash LSH finds exactly the brute-force pairs at tau=0.8 (sf0.001)") {
    val docs = Tables.table(spark, sf0001, "documents")
    val lsh = SparkEntry.queries("q28_minhash_neardup")(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force over all pairs with the same shingle sets
    val sets = docs.select($"doc_id",
      TextFunctions.shingles($"text", 3).as("sh"))
    val brute = sets.toDF("id_a", "sh_a")
      .crossJoin(sets.toDF("id_b", "sh_b"))
      .filter($"id_a" < $"id_b")
      .withColumn("j", Dedup.jaccard($"sh_a", $"sh_b"))
      .filter($"j" >= 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh === brute, "LSH + verify must equal brute force here")
    assert(brute.nonEmpty, "testdata should contain planted near-dups")
  }

  test("simhash near-dup pairs are a subset of minhash pairs' similarity regime") {
    val sim = SparkEntry.queries("q30_simhash_neardup")(spark, sf0001)
    // hamming bound respected and pairs unique
    val rows = sim.collect()
    assert(rows.forall(_.getAs[Int]("hamming") <= 6))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length === rows.length)
  }

  test("adaptive simhash: banded path returns exactly the all-pairs set") {
    val docs = Tables.table(spark, sf0001, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val allPairs = pairs(
      graft.dedup.Dedup.simhashNearDupPairs(docs, "doc_id", "text"))
    // limit 0 forces the banded path; pigeonhole recall is guaranteed,
    // and the exact hamming filter makes precision exact, so the sets
    // must be identical — not merely similar
    val banded = pairs(graft.dedup.Dedup.simhashNearDupPairsAdaptive(
      docs, "doc_id", "text", allPairsLimit = 0L))
    val adaptiveSmall = pairs(graft.dedup.Dedup.simhashNearDupPairsAdaptive(
      docs, "doc_id", "text"))
    assert(banded === allPairs)
    assert(adaptiveSmall === allPairs)
  }

  private def recallVsBrute(annQuery: String): Double = {
    val brute = SparkEntry.queries("q31_cosine_topk")(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = SparkEntry.queries(annQuery)(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (brute & ann).size.toDouble / brute.size
  }

  test("LSH ANN recall@5 vs brute force") {
    val recall = recallVsBrute("q33_ann_lsh_topk")
    info(s"LSH ANN recall@5 = $recall")
    assert(recall >= 0.8,
      s"multi-probe hyperplane LSH should catch most true neighbors, got $recall")
  }

  test("IVF ANN recall@5 vs brute force") {
    val recall = recallVsBrute("q40_ann_ivf_topk")
    info(s"IVF ANN recall@5 = $recall")
    assert(recall >= 0.75,
      s"IVF nprobe=4/16 should catch most true neighbors, got $recall")
  }

  test("quantized ANN recall@5 vs brute force (exact rescore)") {
    val recall = recallVsBrute("q90_ann_quantized_topk")
    info(s"quantized ANN recall@5 = $recall")
    assert(recall >= 0.9,
      s"int8 cells are ~0.4% of the range — overfetch x4 should recover nearly all true neighbors, got $recall")
  }

  test("cosine is exact and symmetric on a known case") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = VectorFunctions
      .cosineNearDupPairs(df, "vec_id", "embedding", 0.99)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq === Seq((1L, 3L, 1.0)), "only colinear pair survives")
  }

  test("quality score bounded in [0,1]") {
    val scores = SparkEntry.queries("q24_text_stats")(spark, sf0001)
      .select("quality_score").as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("maxMultiplicity equals the model max element count") {
    val rnd = new scala.util.Random(99)
    val cases = (0 until 20).map { _ =>
      List.fill(rnd.nextInt(30))("w" + rnd.nextInt(6))
    } :+ List.empty[String] :+ List("solo")
    val df = cases.zipWithIndex.map { case (l, i) => (i, l) }.toDF("i", "arr")
    val got = df.select($"i",
      TextFunctions.maxMultiplicity($"arr").as("m"))
      .as[(Int, Long)].collect().toMap
    cases.zipWithIndex.foreach { case (l, i) =>
      val want = if (l.isEmpty) 0L
        else l.groupBy(identity).values.map(_.size).max.toLong
      assert(got(i) === want, s"case $i: $l")
    }
  }

  test("topNgramFrac: repeated phrase dominates; short docs are 0") {
    val df = Seq(
      (1, "a b a b a b a b"),        // bigram "a b" appears 4 of 7
      (2, "x"),                      // too short for bigrams
      (3, "p q r s t")               // all bigrams unique
    ).toDF("id", "text")
    val got = df.select($"id",
      TextFunctions.topNgramFrac($"text", 2).as("f"))
      .as[(Int, Double)].collect().toMap
    assert(math.abs(got(1) - 4.0 / 7.0) < 1e-6)
    assert(got(2) === 0.0)
    assert(math.abs(got(3) - 0.25) < 1e-6)
  }

  test("normalizeText: NFC unifies composed/decomposed, collapses space, lowers") {
    graft.functions.GraftFunctions.register(spark)
    // "é" composed (U+00E9) vs decomposed (e + U+0301): byte-different,
    // must normalize (and therefore dedup-hash) identically
    val composed = "Caf\u00e9  du   Monde"
    val decomposed = "Cafe\u0301  du   Monde"
    val df = Seq((1, composed), (2, decomposed)).toDF("id", "text")
      .select($"id", TextFunctions.normalizeText($"text").as("n"),
        TextFunctions.contentHash(TextFunctions.normalizeText($"text")).as("h"))
    val rows = df.collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows(1)._1 === "café du monde")
    assert(rows(1) === rows(2), "composed and decomposed must unify")
  }

  test("deterministic shuffle: permutation stable under repartition, salt-sensitive") {
    val docs = Tables.table(spark, sf0001, "documents").select($"doc_id")
    def order(df: org.apache.spark.sql.DataFrame, salt: String) =
      graft.text.Sampling.deterministicShuffle(df, "doc_id", salt)
        .select($"doc_id").as[Long].collect().toSeq
    val a = order(docs, "shuffle")
    val b = order(docs.repartition(17), "shuffle")
    assert(a === b, "same permutation on any partitioning")
    assert(a.sorted != a, "it actually permutes")
    val c = order(docs, "epoch2")
    assert(a !== c, "different salt draws a different permutation")
    assert(a.sorted === c.sorted, "same membership")
  }
}
