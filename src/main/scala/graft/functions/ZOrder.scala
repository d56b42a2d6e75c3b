package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve value as pure Column arithmetic — the
  * multi-dimensional clustering key (Morton 1966; the technique
  * behind Delta's OPTIMIZE ZORDER BY and Iceberg's zorder sort):
  * interleaving the bits of two dimensions makes points close in BOTH
  * dimensions close on the curve, so range-partitioning by z gives
  * every partition a tight bounding box in each dimension at once —
  * which is exactly what per-shard min/max pruning needs to work on
  * more than one column.
  *
  * Everything here is `org.apache.spark.sql.functions` bit
  * arithmetic (shiftleft / bitwiseAND / bitwiseOR), so the whole key
  * stays inside whole-stage codegen — no UDF, no custom Expression
  * needed for a pure bit shuffle. */
object ZOrder {

  /** Bits kept per dimension. 30 bits each → a 60-bit positive z;
    * clustering needs locality, not exactness, and 2^30 distinct
    * cells per dimension is far below any shard count. */
  val BitsPerDim = 30

  private val MaxCode = (1L << BitsPerDim) - 1

  /** Classic mask-shift bit spreading: x₀x₁…x₂₉ → x₀0x₁0…x₂₉0
    * (each input bit moved to an even position). Five rounds of
    * `(x | x << s) & mask` — the standard 64-bit Morton spread. */
  private val Spread: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  private def spread(c: Column): Column =
    Spread.foldLeft(c) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Scale a long column linearly onto [0, 2^30) given its domain —
    * the per-dimension normalization that makes unlike domains (ids
    * in billions, small categorical codes) interleave meaningfully. */
  def scaled(c: Column, min: Long, max: Long): Column =
    if (max <= min) lit(0L)
    else ((c - lit(min)).cast("double") / lit((max - min).toDouble) *
      lit(MaxCode.toDouble)).cast("long")

  /** The interleaved z value of two pre-scaled ([0, 2^30)) columns. */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Bits per dimension for an n-dim key: the 2-dim spread keeps its
    * 30; higher arities split the 62 positive bits evenly (3 dims →
    * 20 bits → 2^20 cells per dimension, still far beyond any shard
    * count — clustering needs locality, not exactness). */
  def bitsFor(n: Int): Int = math.min(BitsPerDim, 62 / n)

  /** Scale onto [0, 2^bits) with CLAMPING — out-of-domain values
    * (an incremental clustering step scaling fresh rows by the
    * RECORDED domain) pin to the curve's edge instead of corrupting
    * the interleave. */
  def scaledTo(c: Column, min: Long, max: Long, bits: Int): Column = {
    val maxCode = (1L << bits) - 1
    if (max <= min) lit(0L)
    else least(lit(maxCode),
      greatest(lit(0L),
        ((c - lit(min)).cast("double") / lit((max - min).toDouble) *
          lit(maxCode.toDouble)).cast("long")))
  }

  /** The interleaved z value of n pre-scaled ([0, 2^bitsFor(n)))
    * columns — dimension d's bit i lands at position i*n + d. Two
    * dims take the 5-round mask spread; n ≥ 3 builds per-bit (30–60
    * shift/and/or ops per row, all inside whole-stage codegen — a
    * pure projection, no UDF). */
  def zvalueN(cols: Seq[Column]): Column = {
    require(cols.size >= 2, "z-order needs at least 2 dimensions")
    if (cols.size == 2) return zvalue(cols(0), cols(1))
    val n = cols.size
    val bits = bitsFor(n)
    cols.zipWithIndex.map { case (c, d) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + d)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }
}
