package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_might_contain(key, bloomBytes)`: membership probe of a
  * long key against a serialized `org.apache.spark.util.sketch
  * .BloomFilter` — the engine's runtime-filter primitive (the same
  * sketch Spark's own `InjectRuntimeFilter` rule probes).
  *
  * `bloomBytes` must be FOLDABLE (a binary literal): the filter is
  * deserialized ONCE per expression instance and ships to executors
  * as a codegen reference object, so the generated code is a single
  * virtual call per row regardless of filter size — no per-row
  * deserialization, no UDF boundary, stays inside whole-stage
  * codegen. May return false positives, never false negatives; callers
  * follow with an exact join (see graft.operators.BloomJoin).
  */
case class BloomMightContainExpr(key: Expression, bloomExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = key
  override def right: Expression = bloomExpr
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = key.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain expects a BIGINT key, got ${key.dataType.sql}")
    else if (bloomExpr.dataType != BinaryType || !bloomExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_might_contain expects a foldable BINARY bloom filter")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloomExpr.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(k: Any, @annotation.unused b: Any): Any =
    filter.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    val keyGen = key.genCode(ctx)
    ev.copy(
      code = code"""
        ${keyGen.code}
        boolean ${ev.isNull} = ${keyGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.mightContainLong(${keyGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(key = newLeft, bloomExpr = newRight)
}
