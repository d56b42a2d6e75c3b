package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Group-level MinHash signature as a custom
  * `TypedImperativeAggregate[Array[Long]]` — the mutable-buffer
  * aggregate tier (the home of sketches: HLL, CMS, and this).
  *
  * For each group it maintains k running minima of per-seed hashes of
  * the input strings; two groups' signatures estimate the jaccard of
  * their element SETS by the fraction of agreeing positions. Buffers
  * merge element-wise (min is associative/commutative), so the
  * aggregate is partial-aggregation friendly: each partition ships k
  * longs, not its elements — a constant-size group summary at any
  * scale, the same contract as approx_count_distinct.
  *
  * SQL: `graft_minhash_sig(expr)` after GraftFunctions.register.
  */
case class MinHashSigAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  /** Hash the bytes once, then derive k independent values by
    * splitmix64 finalization — a far better-distributed (and cheaper)
    * family than re-seeding a 32-bit hash k times. */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val base = (MurmurHash3.bytesHash(bytes, 0xcafebabe).toLong << 32) |
        (MurmurHash3.bytesHash(bytes, 0x9747b28c).toLong & 0xffffffffL)
      var i = 0
      while (i < k) {
        val h = splitmix64(base ^ (i.toLong * 0xff51afd7ed558ccdL))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashSigAgg = copy(child = c.head)
}

object MinHashSigAgg {
  /** Estimated jaccard of two signatures: agreeing-position fraction. */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
}
