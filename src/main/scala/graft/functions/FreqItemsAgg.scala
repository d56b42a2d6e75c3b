package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a
  * `TypedImperativeAggregate[mutable.HashMap[String, Long]]` — the
  * constant-memory answer to "top terms in a 100 TB corpus".
  *
  * The buffer holds at most `capacity` (term → count) entries. Update
  * is classic Misra-Gries: increment if present, insert if room,
  * otherwise decrement every counter (dropping zeros) — a global
  * "charge one occurrence of each tracked term" step. Merge (Agarwal
  * et al., "Mergeable Summaries", PODS 2012) sums counters pointwise
  * and, when over capacity, subtracts the (capacity+1)-th largest
  * count from all and drops the non-positive. Both preserve the MG
  * invariant: for every term,
  *
  *   trueCount - N/(capacity+1)  ≤  sketchCount  ≤  trueCount
  *
  * (N = total stream length), so any term with frequency above
  * N/(capacity+1) is guaranteed present. Each partition ships at most
  * `capacity` entries regardless of input size — the same partial-
  * aggregation contract as approx_count_distinct, where the exact
  * explode+groupBy would shuffle the full term frequency table.
  *
  * Eval returns array<struct<term,cnt>> sorted by (cnt desc, term) —
  * deterministic for stable top-k extraction.
  *
  * SQL: `graft_freq_items(expr[, capacity])` after
  * GraftFunctions.register.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(capacity > 0, s"capacity=$capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1L)
        case None if buf.size < capacity => buf.update(term, 1L)
        case None => // decrement-all step; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (t, c) =>
            if (c == 1L) dead += t else buf.update(t, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positive
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.foreach { case (t, c) =>
        if (c - sub <= 0L) dead += t else b1.update(t, c - sub)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqItemsAgg = copy(child = c.head)
}
