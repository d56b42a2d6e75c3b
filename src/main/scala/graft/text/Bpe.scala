package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the real subword tokenization an
  * LLM data pipeline meters its corpus with (the regex "BPE-ish"
  * count in TextFunctions is the cheap proxy; this is the actual
  * merge-table algorithm).
  *
  * Split of labor at scale:
  *  - TRAIN ([[train]]): the classic frequency-table algorithm.
  *    The distributed part is one word-count aggregate (shuffle on
  *    the word); the merge loop then runs driver-side over the
  *    BOUNDED word-frequency table (top `maxVocab` words) — the same
  *    bounded-model-artifact class as IVF centroids. Deterministic:
  *    ties in pair frequency break lexicographically, ties in word
  *    frequency break on the word.
  *  - ENCODE ([[encode]]): scan-parallel greedy merge-by-rank per
  *    row via the `graft_bpe_encode` expression (BpeEncodeExpr). The
  *    merge table rides as a FOLDABLE literal child, deserialized
  *    once per executor into a rank map and invoked as one static
  *    call from generated code — no UDF boundary, no per-row
  *    deserialization, whole-stage codegen intact.
  *
  * No DuckDB oracle (an iterative merge loop is not SQL-expressible);
  * the correctness contract is `BpeSpec`: hand-worked examples, an
  * independent model implementation, determinism under
  * repartitioning, and the token-concatenation round-trip.
  */
object Bpe {

  /** Learn `numMerges` merge rules from the corpus' word-frequency
    * table. Words split on whitespace; symbols start as single
    * characters. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 10000): Seq[(String, String)] = {
    val wordFreq = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromFreqs(wordFreq, numMerges)
  }

  /** Code-point split — NOT UTF-16 chars: a char-level split turns
    * non-BMP characters (emoji etc.) into lone surrogates, which
    * UTF8String encodes as '?', corrupting tokens unless a merge
    * happens to rejoin exactly that pair. Shared by train and encode
    * so the symbol alphabet can never diverge between them. */
  private[text] def codePoints(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** The driver-side merge loop, exposed for the spec's model. */
  def trainFromFreqs(wordFreq: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, n) => (codePoints(w), n) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max frequency, ties broken lexicographically — deterministic
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) { out += joined; i += 2 }
            else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
      }
    }
    merges.toSeq
  }

  /** Tokenize `textCol` with the learned merges: array<string> of
    * subword tokens (whitespace-split words, each greedily merged by
    * rank). */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_encode", textCol,
      typedlit(merges.map(p => Seq(p._1, p._2))))
}

/** Executor-side BPE model: pair → merge rank. Built once per
  * expression instance from the literal merge table. */
case class BpeModel(merges: Seq[(String, String)]) {
  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  def encodeWord(w: String): mutable.ArrayBuffer[String] = {
    val syms = mutable.ArrayBuffer.empty[String]
    syms ++= Bpe.codePoints(w) // code points, not UTF-16 chars (see there)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) continue = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Whole-text encode: split on single spaces, concat word tokens. */
  def encodeText(text: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    text.split(" ", -1).foreach { w =>
      if (w.nonEmpty) out ++= encodeWord(w)
    }
    out.toArray
  }
}
