package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The graft_* function surface exposed through Spark's V2
  * FunctionCatalog — the catalog seam that makes the functions
  * resolvable by QUALIFIED NAME from any session that only knows the
  * catalog conf (`SELECT glog.graft_nfc(...)`), with no Scala call to
  * [[GraftFunctions.register]] first. The session-registry route
  * (createOrReplaceTempFunction) is JVM-session-scoped: a pure-SQL
  * client (thrift, connect, a notebook that only sets confs) can
  * never reach it; the FunctionCatalog is the engine-blessed way to
  * ship functions WITH a catalog.
  *
  * Each function implements the ScalarFunction MAGIC METHOD
  * (`invoke` over internal types — UTF8String/ArrayData), so
  * resolution plans an `Invoke` on the bound instance: fully
  * codegen-compatible, no per-row InternalRow boxing (that fallback,
  * `produceResult`, is also implemented as the API requires). Kernels
  * are SHARED with the session-registered codegen Expressions
  * ([[NfcNormalize.normalize]]), so both routes are value-identical
  * by construction.
  */
object GraftV2Functions {
  val names: Seq[String] = Seq("graft_nfc", "graft_dot")

  def load(name: String): UnboundFunction = name.toLowerCase match {
    case "graft_nfc" => NfcV2
    case "graft_dot" => DotV2
    case other => throw new NoSuchElementException(
      s"function $other is not in the graft catalog " +
        s"(has: ${names.mkString(", ")})")
  }
}

/** `glog.graft_nfc(string) → string`: Unicode NFC normalization. */
object NfcV2 extends UnboundFunction {
  override def name(): String = "graft_nfc"
  override def description(): String =
    "graft_nfc(string): Unicode NFC normalization"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == StringType,
      s"graft_nfc expects (string), got ${inputType.simpleString}")
    NfcV2Bound
  }
}

object NfcV2Bound extends ScalarFunction[UTF8String] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = StringType
  override def name(): String = "graft_nfc"
  override def canonicalName(): String = "graft.graft_nfc"
  override def isDeterministic: Boolean = true
  /** Magic method — resolved to a codegen'd Invoke. */
  def invoke(s: UTF8String): UTF8String =
    if (s == null) null else NfcNormalize.normalize(s)
  override def produceResult(input: InternalRow): UTF8String =
    if (input.isNullAt(0)) null
    else NfcNormalize.normalize(input.getUTF8String(0))
}

/** `glog.graft_dot(array<float>, array<float>) → double`: dot product
  * accumulated in double in ascending index order — the same fold as
  * the session-registered graft_dot Expression, so embedding scores
  * agree bit-for-bit across both routes. */
object DotV2 extends UnboundFunction {
  override def name(): String = "graft_dot"
  override def description(): String =
    "graft_dot(array<float>, array<float>): exact-order dot product"
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.fields.length == 2 && inputType.fields.forall(
      _.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
    require(ok,
      s"graft_dot expects (array<float>, array<float>), " +
        s"got ${inputType.simpleString}")
    DotV2Bound
  }
}

object DotV2Bound extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(FloatType), ArrayType(FloatType))
  override def resultType(): DataType = DoubleType
  override def name(): String = "graft_dot"
  override def canonicalName(): String = "graft.graft_dot"
  override def isDeterministic: Boolean = true
  /** Magic method — resolved to a codegen'd Invoke. */
  def invoke(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
  override def produceResult(input: InternalRow): java.lang.Double =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else invoke(input.getArray(0), input.getArray(1))
}
