package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Equivalence of the single-pass text kernels (graft_gopher_stats,
  * graft_text_stats, graft_shingles) with the Catalyst
  * higher-order-function renderings they replaced — the HOF forms are
  * re-stated inline here as the reference model and both are run over
  * randomized word-soup plus adversarial edge cases (empty string,
  * multiple/leading/trailing spaces, non-ASCII, supplementary-plane
  * code points, single word). The DuckDB oracle pins cross-engine
  * agreement; this pins kernel-vs-HOF agreement including inputs the
  * corpus never produces. */
class KernelSpec extends SparkSuite {
  import spark.implicits._

  private val edge = Seq(
    "", " ", "  ", "a", "a ", " a", "a  b", "a b a b a b",
    "é é é", // composed + decomposed + composed
    "😀 emoji 😀 emoji", // supplementary plane
    "the the the the", "x")
  private val rng = new scala.util.Random(42)
  private val vocab = Seq("the", "a", "of", "tök", "x", "yy", "zzz", "wwww")
  private val fuzz = (1 to 200).map { _ =>
    (0 until rng.nextInt(30)).map(_ => vocab(rng.nextInt(vocab.size)))
      .mkString(" ")
  }
  private def docs = (edge ++ fuzz).zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  // the pre-kernel HOF renderings, verbatim
  private def hofWords(c: org.apache.spark.sql.Column) = split(c, " ")
  private def hofMeanWordLen(t: org.apache.spark.sql.Column) = {
    val w = hofWords(t)
    round(aggregate(w, lit(0L), (acc, x) => acc + length(x).cast("long"))
      .cast("double") / size(w).cast("double"), 6)
  }
  private def hofDupWordFrac(t: org.apache.spark.sql.Column) = {
    val w = hofWords(t)
    round(lit(1.0) -
      size(array_distinct(w)).cast("double") / size(w).cast("double"), 6)
  }
  private def hofNgrams(t: org.apache.spark.sql.Column, n: Int) = {
    val w = hofWords(t)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }
  private def hofTopNgramFrac(t: org.apache.spark.sql.Column, n: Int) = {
    val g = hofNgrams(t, n)
    when(size(g) > 0,
      round(TextFunctions.maxMultiplicity(g).cast("double") /
        size(g).cast("double"), 6))
      .otherwise(lit(0.0))
  }
  private def hofShingles(t: org.apache.spark.sql.Column, n: Int) =
    array_distinct(hofNgrams(t, n))
  private def hofBpe(t: org.apache.spark.sql.Column) =
    aggregate(hofWords(t), lit(0L),
      (acc, w) => acc + ((length(w) + lit(3)).cast("long") / lit(4)).cast("long"))
  private def hofStops(t: org.apache.spark.sql.Column) =
    size(filter(hofWords(t),
      w => w.isin(TextFunctions.stopwordsEn.map(lit): _*)))
  private def hofQuality(t: org.apache.spark.sql.Column) = {
    val n = size(hofWords(t)).cast("double")
    val uniq = size(array_distinct(hofWords(t))).cast("double")
    val stops = hofStops(t).cast("double")
    round(least(lit(1.0), n / lit(100.0)) * lit(0.4) +
      (uniq / n) * lit(0.4) +
      least(lit(1.0), stops * lit(5.0) / n) * lit(0.2), 6)
  }

  private def assertAllEqual(name: String,
      kernel: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val bad = docs.select($"doc_id", $"text",
      kernel.as("k"), hof.as("h"))
      .filter(!($"k" <=> $"h")).collect()
    assert(bad.isEmpty,
      s"$name diverges on: ${bad.take(5).mkString("; ")}")
  }

  test("gopher kernel fields equal the HOF renderings") {
    assertAllEqual("mean_word_len",
      TextFunctions.meanWordLen($"text"), hofMeanWordLen($"text"))
    assertAllEqual("dup_word_frac",
      TextFunctions.dupWordFrac($"text"), hofDupWordFrac($"text"))
    assertAllEqual("top_bigram_frac",
      TextFunctions.topNgramFrac($"text", 2), hofTopNgramFrac($"text", 2))
    assertAllEqual("top_trigram_frac",
      TextFunctions.topNgramFrac($"text", 3), hofTopNgramFrac($"text", 3))
  }

  test("text-stats kernel fields equal the HOF renderings") {
    assertAllEqual("n_bpe_tokens",
      TextFunctions.bpeTokenCount($"text"), hofBpe($"text"))
    assertAllEqual("n_stopwords",
      TextFunctions.stopwordHits($"text"), hofStops($"text"))
    assertAllEqual("quality_score",
      TextFunctions.qualityScore($"text"), hofQuality($"text"))
  }

  test("shingles kernel equals the HOF rendering (n = 2, 3, 13)") {
    for (n <- Seq(2, 3, 13))
      assertAllEqual(s"shingles$n",
        TextFunctions.shingles($"text", n), hofShingles($"text", n))
  }

  test("ngrams kernel (multiplicities kept) equals the HOF rendering") {
    for (n <- Seq(2, 3))
      assertAllEqual(s"ngrams$n",
        TextFunctions.ngrams($"text", n), hofNgrams($"text", n))
  }

  test("kernels null-propagate") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(TextFunctions.qualityScore($"text").as("q"),
        TextFunctions.passesGopher($"text").as("p"),
        TextFunctions.shingles($"text", 3).as("s"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
