package graft

import org.apache.spark.sql.functions._

/** Contracts for q203–q205 (attention pricing, NIAH builder, vocab
  * ablation) beyond their DuckDB hashes. */
class EvalBuildersSpec extends SparkSuite {
  import spark.implicits._

  test("q203 masked cost lower-bounds both packings; ratios sane") {
    val r = SparkEntry.queries("q203_attention_cost")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (tokens, nDocs, concatC, padC, maskedC, vsConcat, vsPad) = r
    assert(tokens > 0 && nDocs > 0)
    // block-diagonal masking is the floor of any layout that respects
    // document boundaries (docs here are far under L=2048)
    assert(maskedC <= padC, s"masked $maskedC > pad $padC")
    assert(maskedC <= concatC, s"masked $maskedC > concat $concatC")
    assert(vsConcat <= 1000L && vsPad <= 1000L)
    // and pad cost is exactly tokens * L by construction
    assert(padC == tokens * 2048L)
  }

  test("q204 assembly md5 is reconstructable from the manifest") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q204_needle_haystack")(spark, dir)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.length == 50)
    // token conservation: haystack tokens == the corpus' word count
    val words = Tables.table(spark, dir, "documents")
      .select(size(split($"text", " ")).cast("long")).as[Long]
      .collect().sum
    assert(rows.map(_._3).sum == words)
    // depths cover the range (deterministic per corpus, spread by the
    // hash): some shallow, some deep
    assert(rows.map(_._4).min < 250 && rows.map(_._4).max > 750)
    // rebuild one haystack by hand and match its md5
    val (hid, _, _, _, k, md5Got) = rows.head
    val htext = Tables.table(spark, dir, "documents")
      .filter($"doc_id" >= hid * 10 && $"doc_id" < (hid + 1) * 10)
      .orderBy($"doc_id").select($"text").as[String].collect()
      .mkString(" ")
    val ws = htext.split(" ", -1)
    val needle = "The secret ingredient is graft number FORTYTWO ."
    val assembled = Seq(ws.take(k.toInt).mkString(" "), needle,
      ws.drop(k.toInt).mkString(" ")).mkString(" ")
    val md5Want = java.security.MessageDigest.getInstance("MD5")
      .digest(assembled.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5Got == md5Want)
  }

  test("q205 fertility improves monotonically with vocab size") {
    val rows = SparkEntry.queries("q205_bpe_vocab_ablation")(
      spark, sf0001)
      .select($"k", $"n_chars", $"n_bpe_tokens")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 8, 17))
    // merges only ever reduce token counts; a strictly larger merge
    // table must tokenize this corpus into strictly fewer tokens
    assert(rows(0)._3 > rows(1)._3 && rows(1)._3 > rows(2)._3,
      s"token counts not decreasing: ${rows.map(_._3).toSeq}")
    // k=0 is character-level: tokens == non-space characters
    val nonSpace = Tables.table(spark, sf0001, "documents")
      .select(length(regexp_replace($"text", " ", "")).cast("long"))
      .as[Long].collect().sum
    assert(rows(0)._3 == nonSpace,
      s"char-level count ${rows(0)._3} != non-space chars $nonSpace")
  }
}
