package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Portable fixed-size frequency/membership sketches as typed
  * `Aggregator`s — the mergeable-summaries family (Agarwal et al., PODS
  * 2012) alongside [[MisraGriesAggregator]]:
  *
  *  - [[CountMinAggregator]]: a d×w counter matrix; merge is pointwise
  *    addition, so the merged sketch is EXACTLY the sketch of the
  *    concatenated stream — estimates are deterministic whatever the
  *    partition/merge order, which is what lets a DuckDB oracle recompute
  *    every cell relationally (cell value = Σ counts of colliding keys)
  *    and hash-check the Spark sketch cell-for-cell (x54).
  *  - [[BloomAggregator]]: an m-bit array; merge is bitwise OR — same
  *    order-independence, no false negatives ever, so a bloom PREFILTER
  *    composes with an exact verify join into an exactly-checkable
  *    operator (x55), the same estimate-then-verify contract as x42.
  *
  * Both use the same cross-engine hash family [[Sketches.foldHash]]: a
  * seed-7 polynomial fold with per-row multiplier (31+i) mod 1e9+7 over
  * codepoints — `list_reduce`-replayable in DuckDB (the [[Text.charHash]]
  * portability rule), no xxhash64 anywhere near an oracle.
  *
  * Scale: state is O(d·w) / O(m) bits per partition partial regardless of
  * input size or cardinality — these exist precisely because a
  * `groupBy(key)` exchange at web-corpus vocabulary (10^8+ keys) is the
  * thing to avoid; a sketch crosses the wire once per task.
  */
object Sketches {

  /** Row-i hash: fold seed 7, acc·(31+i)+codepoint mod 1e9+7. Callers
    * guarantee non-empty input. */
  def foldHash(s: String, i: Int): Long = {
    var acc = 7L
    var j = 0
    while (j < s.length) {
      acc = (acc * (31L + i) + s.charAt(j).toLong) % 1000000007L
      j += 1
    }
    acc
  }

  /** The same fold as a native column (for probing a broadcast sketch
    * without re-entering the aggregator) — mirrors [[Text.charHash]]'s
    * shape; callers filter empty strings (sequence(1,0) descends). */
  def foldHashCol(sc: Column, i: Int): Column =
    aggregate(sequence(lit(1), length(sc)), lit(7L),
      (acc, j) =>
        (acc * (31L + i) + ascii(sc.substr(j.cast("int"), lit(1))).cast("long"))
          % 1000000007L)

  /** The identical fold in DuckDB SQL over a string expression `e`, for
    * interpolation into oracles (i is the row index, a SQL expression). */
  def foldHashSql(e: String, i: String): String =
    s"""list_reduce(list_prepend(CAST(7 AS BIGINT),
       |      list_transform(range(len($e)), j -> CAST(unicode(($e)[j+1]) AS BIGINT))),
       |      (acc, ch) -> (acc * (31 + $i) + ch) % 1000000007)""".stripMargin
}

/** Count-Min sketch (Cormode & Muthukrishnan 2005): d rows × w counters,
  * est(x) = min_i cell(i, h_i(x)) — an overestimate, never an under. */
class CountMinAggregator(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], x: String): Array[Long] = {
    var i = 0
    while (i < d) {
      buf(i * w + (Sketches.foldHash(x, i) % w).toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Bloom filter: m bits (64-bit words, bit p = word p/64, mask 1<<(p%64)),
  * k hash rows; no false negatives, FP rate (1-e^{-kn/m})^k. */
class BloomAggregator(k: Int, mBits: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(mBits % 64 == 0)

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(buf: Array[Long], x: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val p = (Sketches.foldHash(x, i) % mBits).toInt
      buf(p >> 6) |= (1L << (p & 63))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** CountSketch (Charikar, Chen & Farach-Colton 2002): d rows × w SIGNED
  * counters; row i adds s_i(x) at h_i(x), where h_i is fold row i and
  * s_i comes from fold row i+d (an independent row of the same family).
  * est(x) = MEDIAN over rows of s_i(x)·cell(i, h_i(x)) — collisions
  * cancel in expectation instead of always inflating, so the estimate
  * is unbiased where Count-Min is a guaranteed overcount (x114's report
  * shows errors of BOTH signs). Merge is pointwise addition — the same
  * exact-mergeability contract as [[CountMinAggregator]], so the DuckDB
  * oracle recomputes every signed cell relationally. */
class CountSketchAggregator(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], x: String): Array[Long] = {
    var i = 0
    while (i < d) {
      val sgn = 1L - 2L * (Sketches.foldHash(x, i + d) % 2L)
      buf(i * w + (Sketches.foldHash(x, i) % w).toInt) += sgn
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Column wrappers (x54 / x55 / x114 read these). */
object SketchAgg {
  /** d=4 × w=64: small enough that the sf0.01 vocabulary (~10²-10³
    * distinct words) genuinely collides — the overestimate the spec and
    * oracle both exercise is real, not a degenerate zero. */
  val CmsD = 4
  val CmsW = 64
  private val cms = udaf(new CountMinAggregator(CmsD, CmsW),
    org.apache.spark.sql.Encoders.STRING)
  def countMin(c: Column): Column = cms(c)

  /** d=3 × w=32 — even smaller than the CMS grid, so the signed
    * cancellation CountSketch exists for is violently exercised: every
    * bucket holds ~30 colliding types whose signs fight. */
  val CsD = 3
  val CsW = 32
  private val cs = udaf(new CountSketchAggregator(CsD, CsW),
    org.apache.spark.sql.Encoders.STRING)
  def countSketch(c: Column): Column = cs(c)

  /** k=4, m=2^16 bits (1024 longs, 8 KB): at the fixture's ~1.4·10⁴ train
    * trigrams the fill is ~0.57 → FP ≈ (0.57)⁴ ≈ 11% — false positives
    * OBSERVABLE (n_bloom > n_true rows exist to prove the filter is a
    * bloom, not a set) while still cutting ~89% of clean grams before the
    * verify join. Sizing for a real corpus picks m from the budgeted FP
    * rate the same way: m ≈ -k·n / ln(1 - fp^{1/k}). */
  val BloomK = 4
  val BloomM = 65536
  private val bloom = udaf(new BloomAggregator(BloomK, BloomM),
    org.apache.spark.sql.Encoders.STRING)
  def bloomBits(c: Column): Column = bloom(c)
}
