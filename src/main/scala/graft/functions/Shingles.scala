package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in ONE pass — the codegen kernel
  * behind TextFunctions.shingles. The HOF rendering
  * (`array_distinct(transform(sequence(...), i -> concat_ws(...)))`)
  * evaluates n `element_at` lambdas per shingle interpreted, which
  * for n=13 decontamination grams (and the n=3 MinHash path, the
  * bench's slowest query) dominates the scan. Semantics are
  * identical: order-preserving first-occurrence distinct, space
  * joined, empty array when the doc has < n words.
  *
  * SQL: `graft_shingles(text, n)` after GraftFunctions.register.
  */
case class ShinglesExpr(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (string, n>=1), got (${child.dataType}, $n)")

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShinglesExpr.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  private val empty = new GenericArrayData(Array.empty[Any])

  /** Static kernel shared by interpreted and generated paths.
    * distinct=true → order-preserving first-occurrence set
    * (TextFunctions.shingles); false → every n-gram with
    * multiplicity, in order (TextFunctions.ngrams). */
  def compute(u: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val ws = Words.split(u.toString)
    val total = ws.size - n + 1
    if (total <= 0) return empty
    val out = new java.util.ArrayList[String](total)
    val seen: java.util.HashSet[String] =
      if (distinct) new java.util.HashSet[String](total * 2) else null
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(ws.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(ws.get(i + j)); j += 1 }
      val g = sb.toString
      if (seen == null || seen.add(g)) out.add(g)
      i += 1
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = UTF8String.fromString(out.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}
