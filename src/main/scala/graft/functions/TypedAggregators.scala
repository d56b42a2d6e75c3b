package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s for the Dataset API — the user-facing custom
  * aggregation tier (below them: DeclarativeAggregate /
  * TypedImperativeAggregate for engine-internal ones).
  *
  * DecimalSumAgg mirrors Q.dsum exactly: each double is scaled to a
  * 4-decimal long (HALF_UP, same as Spark's double→DECIMAL(18,4)
  * cast), summed associatively, descaled once — order-independent and
  * overflow-safe to ±9e14, so typed-path results hash-match the SQL
  * path and the DuckDB oracle. */
object TypedAggregators {

  private def scaled(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Exact decimal sum of a projected double field. */
  class DecimalSumAgg[IN](f: IN => Double) extends Aggregator[IN, Long, Double] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: IN): Long = b + scaled(f(a))
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(b: Long): Double =
      java.math.BigDecimal.valueOf(b, 4).doubleValue()
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  class CountAgg[IN] extends Aggregator[IN, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: IN): Long = b + 1L
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
