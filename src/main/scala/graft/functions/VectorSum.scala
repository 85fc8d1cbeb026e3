package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise sum of equal-length long vectors — the missing built-in for
  * vote/histogram accumulation (simhash bit votes, cluster centroid sums).
  * A typed `Aggregator` (SURVEY.md §2.10's UDAF surface): Spark plans it as
  * an ObjectHashAggregate with map-side partials, so only one partially
  * summed vector per (group × partition) crosses the exchange.
  */
object VectorSumAggregator extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  private def requireSameLength(a: Int, b: Int): Unit =
    require(a == b, s"vector_sum over ragged vectors: length $b vs first-seen $a")

  override def reduce(buf: Array[Long], row: Seq[Long]): Array[Long] =
    if (buf.isEmpty) row.toArray
    else {
      requireSameLength(buf.length, row.length)
      var i = 0
      while (i < buf.length) { buf(i) += row(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      requireSameLength(a.length, b.length)
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object VectorSum {
  private val fn = udaf(VectorSumAggregator)

  /** `vector_sum(arrayCol)` — aggregate column usable in `agg(...)`. */
  def apply(c: Column): Column = fn(c)
}
