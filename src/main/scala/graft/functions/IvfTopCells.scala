package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_ivf_top_cells(vec, centroids, n)`: the n best IVF cells for
  * a vector by the L2-argmin ⇔ dot-argmax(v·c − ||c||²/2)
  * equivalence — one small codegen loop over a centroid matrix that
  * is extracted ONCE at planning time from a foldable literal and
  * shipped as a reference object.
  *
  * Why an expression instead of composing array_max over per-cell
  * structs: the composed form builds a (cells × dims)-literal tree
  * whose whole-stage codegen takes seconds to compile and grows with
  * the cell count (measured ~4 s of q40's 5 s at 16×64); this class
  * stays O(1) in generated-source size, so a 4096-cell index compiles
  * as fast as a 16-cell one. Ties break toward the larger cell id,
  * matching the struct-comparison order of the composed form it
  * replaces.
  *
  * Engine-internal (never oracle-compared): scores accumulate in
  * double in index order, deterministically per row.
  */
case class IvfTopCells(vec: Expression, centsExpr: Expression, nExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(vec, centsExpr, nExpr)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(msg)
    vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        (centsExpr.dataType, nExpr.dataType) match {
          case (ArrayType(ArrayType(DoubleType, _), _), IntegerType)
              if centsExpr.foldable && nExpr.foldable =>
            TypeCheckResult.TypeCheckSuccess
          case _ => fail("graft_ivf_top_cells needs a foldable " +
            "array<array<double>> centroid literal and a foldable int n")
        }
      case t => fail(s"graft_ivf_top_cells expects array<float|double> " +
        s"vector, got ${t.sql}")
    }
  }

  /** Float vectors widen per element (exact); double vectors (e.g. a
    * projected corpus — q137's cross-modal space) read as-is. */
  private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Planning-time extraction from the foldable children. */
  private lazy val cents: Array[Array[Double]] = {
    val ad = centsExpr.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  private lazy val n: Int = {
    val v = nExpr.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= cents.length, s"n=$v out of 1..${cents.length}")
    v
  }
  private lazy val halfNorms: Array[Double] =
    cents.map(c => c.map(x => x * x).sum / 2.0)

  private def scoresOf(v: ArrayData): Array[Double] = {
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val dims = math.min(v.numElements(), cent.length)
      var s = 0.0
      var d = 0
      if (vecIsFloat)
        while (d < dims) { s += v.getFloat(d) * cent(d); d += 1 }
      else
        while (d < dims) { s += v.getDouble(d) * cent(d); d += 1 }
      out(c) = s - halfNorms(c)
      c += 1
    }
    out
  }

  /** Top-n selection: score desc, larger cell id on ties (the scan
    * keeps the LAST running max). */
  private def selectTop(scores: Array[Double]): Array[Int] = {
    val top = new Array[Int](n)
    val used = new Array[Boolean](scores.length)
    var k = 0
    while (k < n) {
      var best = -1
      var c = 0
      while (c < scores.length) {
        if (!used(c) && (best < 0 || scores(c) >= scores(best))) best = c
        c += 1
      }
      used(best) = true
      top(k) = best
      k += 1
    }
    top
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else new GenericArrayData(selectTop(scoresOf(v.asInstanceOf[ArrayData])))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("halfNorms", halfNorms, "double[]")
    val vecCode = vec.genCode(ctx)
    val sc = ctx.freshName("scores"); val used = ctx.freshName("used")
    val top = ctx.freshName("top"); val c = ctx.freshName("c")
    val d = ctx.freshName("d"); val s = ctx.freshName("s")
    val k = ctx.freshName("k"); val best = ctx.freshName("best")
    val dims = ctx.freshName("dims")
    val compute =
      s"""
         |double[] $sc = new double[$centsRef.length];
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  int $dims = Math.min(${vecCode.value}.numElements(),
         |    $centsRef[$c].length);
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $dims; $d++) {
         |    $s += ${if (vecIsFloat) s"(double) ${vecCode.value}.getFloat($d)"
                     else s"${vecCode.value}.getDouble($d)"} * $centsRef[$c][$d];
         |  }
         |  $sc[$c] = $s - $normsRef[$c];
         |}
         |boolean[] $used = new boolean[$sc.length];
         |int[] $top = new int[$n];
         |for (int $k = 0; $k < $n; $k++) {
         |  int $best = -1;
         |  for (int $c = 0; $c < $sc.length; $c++) {
         |    if (!$used[$c] && ($best < 0 || $sc[$c] >= $sc[$best])) $best = $c;
         |  }
         |  $used[$best] = true;
         |  $top[$k] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($top);
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
      newChildren: IndexedSeq[Expression]): IvfTopCells =
    copy(vec = newChildren(0), centsExpr = newChildren(1),
      nExpr = newChildren(2))
}
