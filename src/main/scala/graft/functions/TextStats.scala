package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared whitespace tokenizer for the text kernels — exactly Spark's
  * `split(text, " ")`: single-space separator, empty tokens kept
  * (including leading/trailing). */
private[functions] object Words {
  def split(s: String): java.util.ArrayList[String] = {
    val ws = new java.util.ArrayList[String](16)
    var start = 0
    var sp = s.indexOf(' ')
    while (sp >= 0) {
      ws.add(s.substring(start, sp))
      start = sp + 1
      sp = s.indexOf(' ', start)
    }
    ws.add(s.substring(start))
    ws
  }

  /** Spark `length()` semantics: code points, not UTF-16 units. */
  def numChars(w: String): Int = w.codePointCount(0, w.length)

  /** HALF_UP at 6 decimals — the exact arithmetic of Spark's
    * `round(x, 6)` codegen (BigDecimal.valueOf, so the decimal string
    * rendering is what gets rounded). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** Token counts, stopword hits, and the [0,1] quality score in ONE
  * pass over the document — same motivation as [[GopherStatsExpr]]:
  * the `aggregate`/`filter` higher-order folds these replace run
  * interpreted per element and were the hot path of quality gating
  * (q24/q55/q62/q72's budget stage). Arithmetic is bit-identical to
  * the HOF rendering the q24 oracle verified: BPE-ish count is
  * floor((len+3)/4) per word summed as long, quality is
  * least(1, n/100)·0.4 + (uniq/n)·0.4 + least(1, stops·5/n)·0.2
  * evaluated left-to-right in double, rounded HALF_UP at 6 decimals.
  *
  * Returns struct<n_tokens: int, n_uniq_tokens: int,
  * n_bpe_tokens: bigint, n_stopwords: int, quality_score: double>.
  *
  * SQL: `graft_text_stats(text)` after GraftFunctions.register.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats expects a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq_tokens", IntegerType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("quality_score", DoubleType, nullable = false)))

  /** Must stay in sync with TextFunctions.stopwordsEn. */
  private val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "to", "in", "is").foreach(s.add)
    s
  }

  /** Static kernel shared by interpreted and generated paths. */
  def compute(u: UTF8String): InternalRow = {
    val ws = Words.split(u.toString)
    val n = ws.size
    val distinct = new java.util.HashSet[String](n * 2)
    var bpe = 0L
    var stops = 0
    var k = 0
    while (k < n) {
      val w = ws.get(k)
      bpe += (Words.numChars(w) + 3L) / 4L
      if (stopwords.contains(w)) stops += 1
      distinct.add(w)
      k += 1
    }
    val nd = n.toDouble
    val quality = Words.round6(
      math.min(1.0, nd / 100.0) * 0.4 +
        (distinct.size.toDouble / nd) * 0.4 +
        math.min(1.0, stops.toDouble * 5.0 / nd) * 0.2)
    new GenericInternalRow(
      Array[Any](n, distinct.size, bpe, stops, quality))
  }
}
