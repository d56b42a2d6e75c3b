package graft

import org.apache.spark.sql.functions._

/** q98's pigeonhole blocking must equal the all-pairs definition for
  * ANY input — including texts shorter than the 40-char prefix, where
  * the unpadded form truncated the final chunk and could drop a
  * lev ≤ 5 pair (latent on the shipped corpus, which has no sub-40
  * text). The rpad-to-40 fix makes every prefix fixed-length, so the
  * 6-chunk pigeonhole argument holds unconditionally; this spec pins
  * that on a corpus built around the failing shape. */
class EditDistBlockingSpec extends SparkSuite {

  test("blocking equals all-pairs on a corpus with sub-40-char docs") {
    import spark.implicits._
    val base = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefgh"
    val docs = Seq(
      // 36-char doc (lower id) vs 40-char variant: the r4 review's
      // counterexample class — only the truncated final chunk
      // survives unedited in the unpadded form
      (1L, base + "xy", "en"),
      (2L, base.patch(5, "Z", 1) + "xy1234", "en"),
      // short near-identical pair
      (3L, "tiny doc", "en"),
      (4L, "tiny dox", "en"),
      // short vs long, far apart
      (5L, "short", "en"),
      (6L, ("w " * 40).trim, "en"),
      // cross-language pair never joins
      (7L, "tiny doc", "es"),
      // identical 40+ pair
      (8L, ("x" * 45), "en"),
      (9L, ("x" * 44) + "y", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = tmpDir("q98-docs")
    docs.write.parquet(dir.resolve("documents.parquet").toString)

    val got = SparkEntry.queries("q98_editdist_neardup")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    val p = docs.select($"doc_id", $"lang",
      rpad(substring($"text", 1, 40), 40, "\u0001").as("pref"))
    val a = p.toDF("id_a", "lang", "pa")
    val b = p.toDF("id_b", "lang_b", "pb")
    val want = a.join(b, $"lang" === $"lang_b" && $"id_a" < $"id_b")
      .withColumn("dist", levenshtein($"pa", $"pb"))
      .filter($"dist" <= 5)
      .select($"id_a", $"id_b", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(want.nonEmpty, "test corpus must contain qualifying pairs")
    assert(want.exists { case (aId, bId, _) => aId == 1L && bId == 2L },
      "the short-doc counterexample pair must qualify")
    assert(got == want)
  }
}
