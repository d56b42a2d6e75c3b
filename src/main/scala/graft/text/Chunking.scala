package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size context-window chunking — the step between a curated
  * corpus and a training/RAG pipeline: split each document into
  * windows of `windowTokens` tokens advancing by `strideTokens`
  * (overlap = window − stride), so every token appears in at least
  * one window and model context boundaries never hide content.
  *
  * Scale shape: one generator expression per row (`sequence` over the
  * start offsets) + a narrow `posexplode` — chunking is scan-parallel
  * with ZERO shuffles at any corpus size, and the fan-out per row is
  * bounded by ⌈len/stride⌉. Chunk ids are derived from the offset, so
  * the output is deterministic under any partitioning, and
  * `(doc_id, chunk_id)` is a stable global key for downstream joins
  * (e.g. embedding chunks, then mapping vector hits back to spans).
  */
object Chunking {

  /** Output: (idCol, chunk_id, start_token, n_tokens, chunk_text) —
    * chunk_id 0-based, start_token = chunk_id × stride, the final
    * chunk may be shorter than the window (the tail).
    *
    * Window count is 1 for docs ≤ window tokens, else
    * ⌈(len − window)/stride⌉ + 1: the last window starts at the
    * smallest stride multiple whose window reaches the end. A start
    * whose window would sit entirely INSIDE its predecessor's is
    * never emitted — naive "every stride offset" chunking duplicates
    * the tail of ~(window−stride)/stride of all docs into a
    * fully-contained extra window (duplicated training content). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"windowTokens=$windowTokens must be >= 1")
    require(strideTokens >= 1 && strideTokens <= windowTokens,
      s"strideTokens=$strideTokens must be in [1, windowTokens]")
    val ws = TextFunctions.words(col(textCol))
    val n = size(ws)
    // ⌈(n−window)/stride⌉ × stride, as exact double math on ints
    val lastStart: Column =
      when(n <= windowTokens, lit(0L))
        .otherwise(floor(
          (n - lit(windowTokens) + lit(strideTokens - 1)).cast("double")
            / strideTokens).cast("long") * strideTokens)
    val starts: Column =
      when(n >= 1, sequence(lit(0L), lastStart, lit(strideTokens.toLong)))
        .otherwise(array().cast("array<bigint>"))
    val piece = slice(col("__ws"), col("start_token") + 1, lit(windowTokens))
    docs
      .select(col(idCol), ws.as("__ws"), starts.as("__starts"))
      .select(col(idCol), col("__ws"),
        posexplode(col("__starts")).as(Seq("chunk_id", "start_token")))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("start_token").cast("long").as("start_token"),
        size(piece).cast("long").as("n_tokens"),
        array_join(piece, " ").as("chunk_text"))
  }
}
