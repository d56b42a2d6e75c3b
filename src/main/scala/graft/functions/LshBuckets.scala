package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_lsh_buckets(vec, planes, tables, planesPerTable)`: the
  * sign-random-projection bucket id of a vector in each of `tables`
  * hyperplane-LSH hash tables, as one array<long> — bit p of bucket t
  * is set iff vec · planes[t*planesPerTable + p] > 0.
  *
  * Same motivation as IvfTopCells: the composed form (tables ×
  * planes dot-product expressions against literal arrays) generates
  * whole-stage code that takes seconds to compile and grows with the
  * table count; here the plane matrix ships as one reference object
  * and the generated source is constant-size. The per-plane dot
  * accumulates float×double products in index order — identical
  * arithmetic and order to ArrayDotProduct, so the sign bits (and
  * therefore every bucket id) match the composed form bit-for-bit.
  *
  * Engine-internal (buckets are never oracle-compared; candidates are
  * re-scored exactly).
  */
case class LshBuckets(vec: Expression, planesExpr: Expression,
    tablesExpr: Expression, perTableExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] =
    Seq(vec, planesExpr, tablesExpr, perTableExpr)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(msg)
    vec.dataType match {
      case ArrayType(FloatType, _) =>
        (planesExpr.dataType, tablesExpr.dataType, perTableExpr.dataType) match {
          case (ArrayType(ArrayType(DoubleType, _), _), IntegerType, IntegerType)
              if planesExpr.foldable && tablesExpr.foldable &&
                perTableExpr.foldable =>
            TypeCheckResult.TypeCheckSuccess
          case _ => fail("graft_lsh_buckets needs a foldable " +
            "array<array<double>> plane matrix and foldable int tables/planes")
        }
      case t => fail(s"graft_lsh_buckets expects array<float> vector, " +
        s"got ${t.sql}")
    }
  }

  private lazy val planes: Array[Array[Double]] = {
    val ad = planesExpr.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  private lazy val tables: Int = tablesExpr.eval(null).asInstanceOf[Int]
  private lazy val perTable: Int = {
    val v = perTableExpr.eval(null).asInstanceOf[Int]
    require(tables * v == planes.length,
      s"plane matrix has ${planes.length} rows, want tables($tables) × " +
        s"planesPerTable($v)")
    require(v <= 63, "bucket ids are long: at most 63 planes per table")
    v
  }

  private def bucketsOf(v: ArrayData): Array[Long] = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < perTable) {
        val plane = planes(t * perTable + p)
        val dims = math.min(v.numElements(), plane.length)
        var s = 0.0
        var d = 0
        while (d < dims) { s += v.getFloat(d) * plane(d); d += 1 }
        if (s > 0) b |= (1L << p)
        p += 1
      }
      out(t) = b
      t += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else new GenericArrayData(bucketsOf(v.asInstanceOf[ArrayData]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // force extraction so invalid shapes fail at planning, not mid-task
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val nT = tables; val ppt = perTable
    val vecCode = vec.genCode(ctx)
    val out = ctx.freshName("out"); val t = ctx.freshName("t")
    val p = ctx.freshName("p"); val d = ctx.freshName("d")
    val s = ctx.freshName("s"); val b = ctx.freshName("b")
    val dims = ctx.freshName("dims"); val plane = ctx.freshName("plane")
    val compute =
      s"""
         |long[] $out = new long[$nT];
         |for (int $t = 0; $t < $nT; $t++) {
         |  long $b = 0L;
         |  for (int $p = 0; $p < $ppt; $p++) {
         |    double[] $plane = $planesRef[$t * $ppt + $p];
         |    int $dims = Math.min(${vecCode.value}.numElements(), $plane.length);
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dims; $d++) {
         |      $s += ${vecCode.value}.getFloat($d) * $plane[$d];
         |    }
         |    if ($s > 0) $b |= (1L << $p);
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""
        ${vecCode.code}
        boolean ${ev.isNull} = ${vecCode.isNull};
        ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          $compute
        }""")
    } else {
      ev.copy(code = code"""
        ${vecCode.code}
        ArrayData ${ev.value} = null;
        $compute""", isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LshBuckets =
    copy(vec = newChildren(0), planesExpr = newChildren(1),
      tablesExpr = newChildren(2), perTableExpr = newChildren(3))
}
