package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Group-level SimHash fold as a `TypedImperativeAggregate[Array[Int]]`:
  * per group, 60 signed bit counters over the input 60-bit hashes;
  * the final value sets bit k iff counter k is positive — exactly the
  * value the previous 60-conditional-sum groupBy produced, but as ONE
  * aggregate with a constant 60-int mergeable buffer.
  *
  * Why: 60 separate `sum(when(...))` columns generate a huge
  * whole-stage-codegen class (seconds of janino compile per plan
  * shape) and a 60-column intermediate row; this buffer is the sketch
  * shape — partials merge element-wise, each partition ships 240
  * bytes per group at any scale.
  *
  * SQL: `graft_simhash_bits(hashExpr)` after GraftFunctions.register.
  * Engine-internal composition, but the RESULT is oracle-portable
  * because the input hashes are md5-derived (see TextFunctions.hash60)
  * and the bit rule is reproduced in DuckDB SQL (q29/q30 oracles).
  */
case class SimHashBitsAgg(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < bits) {
        buf(k) += (if (((h >> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var k = 0
    while (k < bits) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var k = 0
    while (k < bits) { if (buf(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * bits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashBitsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashBitsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHashBitsAgg = copy(child = c.head)
}
