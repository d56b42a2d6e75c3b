package graft

import org.apache.spark.sql.functions._

/** q161 paragraph-level dedup semantics on a planted corpus:
  * cross-document boilerplate (a paragraph occurring ≥ 3 times) is
  * stripped, unique passages survive IN ORDER, and a document that is
  * pure boilerplate collapses to an empty row rather than vanishing
  * (the curation ledger needs the "stripped to nothing" fact). */
class ParagraphDedupSpec extends SparkSuite {
  import spark.implicits._

  // paragraphs are 8-word windows: build texts from exact 8-word units
  private def para(tag: String): String =
    (1 to 8).map(i => s"$tag$i").mkString(" ")

  test("boilerplate stripped, unique paragraphs kept in order") {
    val boiler = para("b")
    val docs = Seq(
      (1L, s"${para("u")} $boiler ${para("v")}", "src0"),
      (2L, s"$boiler ${para("w")}", "src0"),
      (3L, s"${para("x")} $boiler", "src1"),
      (4L, boiler, "src1")) // pure boilerplate -> stripped to empty
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = tmpDir("paradedup")
    docs.write.parquet(dir.resolve("documents.parquet").toString)

    val got = SparkEntry.queries("q161_paragraph_dedup")(spark, dir.toString)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    assert(got.toSeq == Seq(
      (1L, 3L, 2L, s"${para("u")} ${para("v")}"), // order preserved
      (2L, 2L, 1L, para("w")),
      (3L, 2L, 1L, para("x")),
      (4L, 1L, 0L, ""))) // survives as an empty row, not a dropped one
  }

  test("below-threshold repetition (2 occurrences) is NOT stripped") {
    val twice = para("t")
    val docs = Seq(
      (1L, s"$twice ${para("a")}", "src0"),
      (2L, twice, "src0"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = tmpDir("paradedup2")
    docs.write.parquet(dir.resolve("documents.parquet").toString)

    val got = SparkEntry.queries("q161_paragraph_dedup")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, s"$twice ${para("a")}"),
      (2L, 1L, twice)))
  }
}
