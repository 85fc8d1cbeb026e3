package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter summary (k counters) as a typed `Aggregator` —
  * the mergeable-summaries form (Agarwal et al., PODS 2012): per-partition
  * partials hold at most k-1 counters; merging sums pointwise and subtracts
  * the k-th largest count, which preserves the deterministic guarantee
  * `true_freq - n/k <= counter <= true_freq`. Consequently every item with
  * frequency > n/k SURVIVES whatever the partition/merge order; the
  * candidate set may vary, but a superset of the true heavy hitters never
  * gets lost. Pair it with an exact recount of the O(k) candidates (see
  * x42) and the approximate pass becomes oracle-checkable: estimate, then
  * verify.
  *
  * Scale: state is O(k) per partition partial regardless of input size or
  * vocabulary — the whole point vs `groupBy(word)`, whose exchange carries
  * every distinct key. Reference scope: frequency/top-k analysis mirrors
  * the reference's aggregate surface (seng550_a3-etl queries.py count/max
  * family) pushed to the unbounded-domain regime it never faces.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
    buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1L)
      case None if buf.size < k - 1 => buf.updated(w, 1L)
      case None =>
        // classic decrement step: every live counter pays one unit; zeros
        // drop out. Amortized O(1): a decrement of k counters is funded by
        // k-1 prior arrivals that incremented them.
        buf.flatMap { case (kw, c) => if (c > 1L) Some(kw -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val sum = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (sum.size <= k - 1) sum
    else {
      // subtract the k-th largest count from everything, keep positives —
      // at most k-1 survive, error grows to (err_a + err_b) <= n/k.
      val kth = sum.valuesIterator.toArray.sortBy(-_).apply(k - 1)
      sum.flatMap { case (w, c) => if (c > kth) Some(w -> (c - kth)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object HeavyHitters {
  /** Counters per summary; guarantees survival of any item with
    * frequency > n/K. K=256 bounds the broadcast-able candidate set while
    * leaving a 6x safety margin under x42's 1/40 report threshold. */
  val K = 256

  private val fn = udaf(new MisraGriesAggregator(K), Encoders.STRING)

  /** `heavy_hitter_summary(wordCol)` — aggregate to a word→count map. */
  def apply(c: Column): Column = fn(c)
}
