package graft

/** The property content-defined chunking exists for: a local edit
  * perturbs O(1) chunks, where fixed-stride chunking re-cuts every
  * chunk after the edit point. (LBFS '01; the storage-stability basis
  * of chunk-hash dedup in restic/borg and incremental training-corpus
  * stores.)
  */
class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  private def wordsOf(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => f"w${rnd.nextInt(5000)}%04d")
  }

  test("an insertion perturbs O(1) chunks, not the whole tail") {
    val base = wordsOf(7, 400)
    val edited = (base.take(50) :+ "INSERTED") ++ base.drop(50)
    val docs = Seq(
      (1L, base.mkString(" "), "s"),
      (2L, edited.mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val chunks = graft.queries.TextQueries.cdcChunks(docs)
      .select($"doc_id", $"ch").as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    // CDC: everything but the edited chunk's neighborhood re-syncs.
    // Mean chunk ≈ 16 words over 400 words → ~25 chunks; the edit can
    // touch at most the chunk containing it plus a bounded resync
    // window (the 4-word boundary test re-synchronizes 3 words past
    // the insertion) — allow ≤ 3 differing chunks per side.
    assert((a -- b).size <= 3,
      s"edit invalidated ${(a -- b).size} of ${a.size} original chunks")
    assert((b -- a).size <= 3)
    // and the chunking is non-trivial (actually cut the doc)
    assert(a.size >= 10, s"only ${a.size} chunks — boundary rule inert?")
    // fixed-stride contrast: 16-word strides share (nearly) nothing
    // after position 50
    def strided(ws: Seq[String]) =
      ws.grouped(16).map(_.mkString(" ")).toSet
    val sharedStride = (strided(base) & strided(edited)).size
    assert(sharedStride <= 4,
      "stride chunks unexpectedly stable — the CDC contrast is void")
  }

  test("chunks reassemble the document exactly") {
    val doc = wordsOf(11, 300).mkString(" ")
    val docs = Seq((1L, doc, "s")).toDF("doc_id", "text", "source")
    val n = graft.queries.TextQueries.cdcChunks(docs)
      .agg(org.apache.spark.sql.functions.sum($"chunk_words"))
      .as[Long].head()
    assert(n == 300L, s"chunker lost words: $n of 300")
  }
}
