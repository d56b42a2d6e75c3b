package graft.functions

import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values (KMV / bottom-k) sketch as a custom
  * `TypedImperativeAggregate[java.util.TreeSet[Long]]` — the
  * distinct-set summary member of the sketch family (HLL distinct
  * q17, CMS frequencies q157/q158, Misra-Gries top items q68/q138,
  * MinHash signatures q28).
  *
  * For each group it keeps the k smallest DISTINCT values of the
  * (already-hashed) input column. Unlike a MinHash signature (k
  * independent permutation minima), a bottom-k sketch is a real
  * SUBSET of the group's hashed elements, which buys two estimators
  * a signature cannot give (Beyer et al., SIGMOD'07 "On synopses for
  * distinct-value estimation"; Cohen & Kaplan, PODC'07 bottom-k
  * sketches):
  *
  *  - distinct-count: (k-1) · 2^60 / max(sketch) when full;
  *  - set overlap of two groups: merge the two sketches, keep the k
  *    smallest of the union — those are exactly the k smallest of
  *    A ∪ B, a uniform sample of the union — and count how many of
  *    them sit in BOTH input sketches: that fraction estimates
  *    J(A, B) with no bias and ±O(1/√k) error.
  *
  * The state is a bounded sorted set (≤ k longs): partial aggregation
  * ships k values per (partition, group) and merge is
  * union-then-truncate — associative, commutative, and ORDER-FREE, so
  * the evaluated sketch is a deterministic function of the input SET.
  * That determinism is what lets a DuckDB oracle replay the sketch
  * verbatim (`list_slice(list_sort(list(DISTINCT h)), 1, k)`) and the
  * driver hash-compare it (q162).
  *
  * SQL: `graft_kmv(hashCol[, k])` after GraftFunctions.register.
  * The input must already be a portable hash (TextFunctions.hash60)
  * so both engines agree on the values being ranked.
  */
case class KmvAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): JTreeSet[Long] =
    new JTreeSet[Long]()

  private def add(buf: JTreeSet[Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: JTreeSet[Long], input: InternalRow): JTreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: JTreeSet[Long], b2: JTreeSet[Long]): JTreeSet[Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  /** Ascending array of the (≤ k) smallest distinct input values. */
  override def eval(buf: JTreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: JTreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JTreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg = copy(child = c.head)
}
