package graft

import org.apache.spark.sql.functions._

/** q121's water-filling bracket math on a SKEWED corpus — the shipped
  * testdata has near-uniform source capacities, so the query there
  * only exercises the below-every-cap fallback (level = B/n). Here:
  * caps (5, 50, 500), budget 277 → the valid bracket is k = 2 (both
  * smaller sources stay full), level = 277 − 55 = 222, allocations
  * (5, 50, 222). Also pins Σ allocation = budget exactly. */
class WaterfillSpec extends SparkSuite {

  test("skewed caps: full small sources, clipped large source, exact budget") {
    import spark.implicits._
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(5), "small"),
      (2L, words(50), "mid"),
      (3L, words(300), "big"),
      (4L, words(200), "big"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = tmpDir("waterfill")
    docs.write.parquet(dir.resolve("documents.parquet").toString)

    val got = SparkEntry.queries("q121_token_waterfill")(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    assert(got.toSeq == Seq(
      ("big", 500L, 222.0), ("mid", 50L, 50.0), ("small", 5L, 5.0)))
    assert(got.map(_._3).sum == 277.0) // == (5+50+500) div 2
  }
}
