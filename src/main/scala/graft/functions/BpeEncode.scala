package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.BpeModel

/** `graft_bpe_encode(text, merges)`: BPE-tokenize a string into
  * array<string> subword tokens. `merges` must be a FOLDABLE
  * array<array<string>> literal (the ordered merge table) — the rank
  * map is built ONCE per expression instance and ships as a codegen
  * reference object; generated code makes one call per row into the
  * greedy merge kernel (graft.text.BpeModel), keeping the expression
  * inside whole-stage codegen with no UDF ser/de. */
case class BpeEncodeExpr(text: Expression, mergesExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = mergesExpr
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = text.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects a string, got ${text.dataType.sql}")
    else mergesExpr.dataType match {
      case ArrayType(ArrayType(StringType, _), _) if mergesExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects a foldable array<array<string>> merge table, got ${t.sql}")
    }
  }

  @transient lazy val model: BpeModel = {
    val arr = mergesExpr.eval(null).asInstanceOf[ArrayData]
    val merges = (0 until arr.numElements()).map { i =>
      val pair = arr.getArray(i)
      // value-level validation: the type check can't see arity/nulls
      // inside the literal, and a malformed pair would otherwise read
      // garbage from UnsafeArrayData at eval time
      require(pair != null && pair.numElements() == 2 &&
          !pair.isNullAt(0) && !pair.isNullAt(1),
        s"graft_bpe_encode merge #$i must be a non-null [left, right] pair")
      (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
    }
    BpeModel(merges)
  }

  override protected def nullSafeEval(t: Any, @annotation.unused m: Any): Any =
    BpeEncodeExpr.encode(model, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeEncodeExpr.encode($ref, $t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncodeExpr =
    copy(text = newLeft, mergesExpr = newRight)
}

object BpeEncodeExpr {
  /** Static kernel shared by interpreted and generated paths. */
  def encode(model: BpeModel, text: UTF8String): ArrayData =
    new GenericArrayData(
      model.encodeText(text.toString).map(UTF8String.fromString(_)))
}
