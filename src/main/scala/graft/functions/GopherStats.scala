package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All four Gopher repetition/shape signals (Rae et al. 2021 §A1.1)
  * in ONE pass over the document — a native codegen `Expression`
  * replacing the four-chain of Catalyst higher-order folds
  * (`transform`/`sort_array`/`aggregate`), whose per-element
  * interpreted lambdas made the gate the hot spot of the curation
  * pipeline (~1.4 ms/doc; this kernel is ~10 µs/doc). Semantics are
  * bit-identical to the HOF rendering the q64 oracle verified:
  * tokenization is `split(text, ' ')` with empties kept, word length
  * is code points (Spark `length`), fractions round HALF_UP at 6
  * decimals exactly like Spark's `round`, and the composite gate
  * applies the published thresholds to the rounded values.
  *
  * Returns struct<n_words: bigint, mean_word_len: double,
  * dup_word_frac: double, top_bigram_frac: double,
  * top_trigram_frac: double, passes_gopher: boolean>.
  *
  * SQL: `graft_gopher_stats(text)` after GraftFunctions.register.
  */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStatsExpr.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gopher_stats expects a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    GopherStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("top_trigram_frac", DoubleType, nullable = false),
    StructField("passes_gopher", BooleanType, nullable = false)))

  import Words.round6

  /** Max multiplicity of any word n-gram / n-gram count, rounded; 0.0
    * when the doc is too short to form an n-gram — mirrors
    * TextFunctions.topNgramFrac. */
  private def topFrac(ws: java.util.ArrayList[String], n: Int): Double = {
    val total = ws.size - n + 1
    if (total <= 0) return 0.0
    val counts = new java.util.HashMap[String, Integer](total * 2)
    var max = 0
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(ws.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(ws.get(i + j)); j += 1 }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    round6(max.toDouble / total.toDouble)
  }

  /** Static kernel shared by interpreted and generated paths. */
  def compute(u: UTF8String): InternalRow = {
    val ws = Words.split(u.toString)
    val n = ws.size
    var sumLen = 0L
    val distinct = new java.util.HashSet[String](n * 2)
    var k = 0
    while (k < n) {
      val w = ws.get(k)
      sumLen += Words.numChars(w) // Spark length() = code points
      distinct.add(w)
      k += 1
    }
    val mwl = round6(sumLen.toDouble / n.toDouble)
    val dwf = round6(1.0 - distinct.size.toDouble / n.toDouble)
    val top2 = topFrac(ws, 2)
    val top3 = topFrac(ws, 3)
    val passes = mwl >= 3.0 && mwl <= 10.0 && dwf <= 0.5 &&
      top2 <= 0.18 && top3 <= 0.16
    new GenericInternalRow(
      Array[Any](n.toLong, mwl, dwf, top2, top3, passes))
  }
}
