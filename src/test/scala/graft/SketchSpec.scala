package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomAggregator, CountMinAggregator, SketchAgg, Sketches}

/** Guarantee pins for the fixed-size sketches behind x54/x55 (the DuckDB
  * oracle checks cross-engine parity; these pin the SKETCH PROPERTIES the
  * oracle equality alone wouldn't name): CMS never underestimates, Bloom
  * never false-negatives, and both merge order-independently. */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0_001)

  test("foldHash: scala fold == column fold, row multipliers differ") {
    import spark.implicits._
    val words = Seq("alpha", "b", "gamma_delta_eps")
    val got = words.toDF("w")
      .select(col("w"), Sketches.foldHashCol(col("w"), 0).as("h0"),
        Sketches.foldHashCol(col("w"), 3).as("h3"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    words.foreach { w =>
      val (h0, h3) = got(w)
      assert(h0 == Sketches.foldHash(w, 0))
      assert(h3 == Sketches.foldHash(w, 3))
      assert(h0 != h3, "hash rows are distinct functions")
    }
  }

  test("count-min: est >= true always; merge is partition-order-independent") {
    val agg = new CountMinAggregator(4, 16) // tiny w -> heavy collisions
    val stream = Seq.fill(40)("heavy") ++ (1 to 30).map(i => s"w$i")
    def sketch(xs: Seq[String]) =
      xs.foldLeft(agg.zero.clone())((b, x) => agg.reduce(b, x))
    val whole = sketch(stream)
    // split/merge at several cut points == one-shot sketch (pointwise add)
    Seq(1, 7, 35).foreach { cut =>
      val (l, r) = stream.splitAt(cut)
      val merged = agg.merge(sketch(l), sketch(r))
      assert(merged.toSeq == whole.toSeq, s"merge at $cut differs")
    }
    // point estimates: min over rows, never below the true count
    def est(b: Array[Long], x: String) =
      (0 until 4).map(i => b(i * 16 + (Sketches.foldHash(x, i) % 16).toInt)).min
    assert(est(whole, "heavy") >= 40L)
    (1 to 30).foreach(i => assert(est(whole, s"w$i") >= 1L))
  }

  test("x54: overcount is non-negative and the probe is the exact top-20") {
    val rows = run("x54_countmin").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"CMS underestimated ${r.getString(0)}")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3))
    }
    val cnts = rows.map(_.getLong(1)).toSeq
    assert(cnts == cnts.sortBy(-(_: Long)), "probe ranked by exact count")
  }

  test("bloom: no false negatives; merge is OR; fill matches k inserts") {
    val agg = new BloomAggregator(4, 256)
    val in = (1 to 10).map(i => s"gram$i")
    val whole = in.foldLeft(agg.zero.clone())((b, x) => agg.reduce(b, x))
    def hit(b: Array[Long], x: String) = (0 until 4).forall { i =>
      val p = (Sketches.foldHash(x, i) % 256).toInt
      (b(p >> 6) & (1L << (p & 63))) != 0L
    }
    in.foreach(g => assert(hit(whole, g), s"false negative on $g"))
    val (l, r) = in.splitAt(4)
    val merged = agg.merge(
      l.foldLeft(agg.zero.clone())((b, x) => agg.reduce(b, x)),
      r.foldLeft(agg.zero.clone())((b, x) => agg.reduce(b, x)))
    assert(merged.toSeq == whole.toSeq, "merge != one-shot (OR semantics)")
    val setBits = whole.map(java.lang.Long.bitCount(_)).sum
    assert(setBits > 0 && setBits <= 4 * in.size, "≤ k bits per insert")
  }

  test("x55: bloom hits ⊇ true hits, and the FP layer is visible") {
    val rows = run("x55_bloom_decon").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nGrams, nBloom, nTrue) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nBloom >= nTrue, "a bloom miss can never be a true hit")
      assert(nBloom <= nGrams)
    }
    // the m=2^16 sizing keeps the prefilter useful: bloom-passing grams
    // are a small fraction of all eval grams (else the verify join saved
    // nothing), while n_true > 0 rows prove real contamination survives
    val tot = rows.map(_.getLong(2)).sum.toDouble
    val bloom = rows.map(_.getLong(3)).sum.toDouble
    assert(rows.exists(_.getLong(4) > 0L), "fixture has real contamination")
    assert(bloom < 0.8 * tot, s"prefilter passes too much: $bloom / $tot")
  }

  test("x62: portable HLL lands within its error band, LC branch live") {
    val r = SparkEntry.queries("x62_hll_portable")(spark, sf0_001).head()
    val (exact, est) = (r.getLong(0), r.getDouble(4))
    // sf0.001's 15 users sit in the LinearCounting regime — the
    // correction must engage and land close (LC is near-exact there)
    assert(r.getString(3) == "lc", "small-range correction did not engage")
    assert(math.abs(est - exact) / exact < 0.15,
      s"HLL estimate $est too far from $exact")
    assert(r.getDouble(5) == r.getDouble(5).abs, "rel_err must be >= 0")
    // the interpolated ln table covers every possible zero-register count
    val lnRows = SparkEntry.oracleSql("x62_hll_portable")
      .split("VALUES")(1).split("\\)").count(_.contains("("))
    assert(lnRows >= 255, s"ln lookup table truncated: $lnRows rows")
  }

  test("x54/x55 sketch params match their oracles' interpolated constants") {
    // the oracle SQL is built by interpolating SketchAgg constants — if
    // someone edits the aggregator defaults without touching the SQL the
    // strings below catch it
    val cms = SparkEntry.oracleSql("x54_countmin")
    assert(cms.contains(s"% ${SketchAgg.CmsW} AS INT"))
    assert(cms.contains(s"range(${SketchAgg.CmsD})"))
    val bl = SparkEntry.oracleSql("x55_bloom_decon")
    assert(bl.contains(s"% ${SketchAgg.BloomM} AS INT"))
    assert(bl.contains(s"count(*) = ${SketchAgg.BloomK}"))
  }
}
