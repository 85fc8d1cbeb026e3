package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.JaroWinklerAlgo

/** Pins for the native Jaro-Winkler expression: kernel parity against
  * DuckDB's `jaro_winkler_similarity` (known values probed from DuckDB
  * 1.x — the exact oracle binary the driver runs), algebraic
  * properties, interpreted-vs-codegen agreement, and that x159's
  * two-pass blocking loses nothing at its threshold vs brute-force
  * all-pairs on the fixture.
  */
class JaroWinklerSpec extends AnyFunSuite {
  import SparkTestSession._

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.score(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB jaro_winkler_similarity on probed known values") {
    // (a, b, expected) probed from the driver's DuckDB:
    //   SELECT jaro_winkler_similarity(a, b)
    // covering: transpositions, prefix boost, boost-threshold OFF below
    // 0.7 jaro, the 4-char prefix cap, empties, and exact matches.
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962963),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),
      ("a", "b", 0.0),
      ("crate", "trace", 0.7333333333333333),
      ("dwayne", "duane", 0.8400000000000001),
      ("abcdefgh", "abcdefxx", 0.9),
      ("ab", "abcdefghij", 0.7866666666666667),
      ("xabcdefg", "yabcdefg", 0.9166666666666666),
      ("abcdxxxxxx", "abcdyyyyyy", 0.6), // jaro 0.6 ≤ 0.7 ⇒ no boost
      ("aaaaaaaaaaaaaaaaaaab", "aaaaaaaaaaaaaaaaaaac", 0.98), // cap 4
      ("abcdefghijklmnop", "abcdefghijklmnoq", 0.975))
    cases.foreach { case (a, b, exp) =>
      assert(math.abs(jw(a, b) - exp) < 1e-12, s"jw($a, $b)")
    }
  }

  test("kernel matches DuckDB on MULTI-BYTE UTF-8 (byte-unit window/prefix semantics)") {
    // ADVICE r10: the byte-level rewrite claimed non-ASCII parity but
    // was only ASCII-differential-tested. These values are probed from
    // DuckDB 1.0 (the oracle binary): accented Latin (2-byte seqs), CJK
    // (3-byte seqs), Greek, and mixed — exercising the window, prefix
    // bonus, and transposition paths measured in BYTES, which is what
    // both this kernel and DuckDB's similarity operate on.
    val cases = Seq(
      ("café", "cafe", 0.8483333333333334),
      ("café", "café", 1.0),
      ("naïve", "naive", 0.8577777777777779),
      ("Müller", "Mueller", 0.8285714285714287),
      ("Müller", "Muller", 0.8642857142857143),
      ("日本語", "日本話", 0.9111111111111111),
      ("东京都", "京都", 0.8999999999999999),
      ("señor", "senior", 0.8222222222222222),
      ("Ångström", "Angstrom", 0.7833333333333333),
      ("Πλάτων", "Πλατων", 0.9666666666666666),
      ("smörgåsbord", "smorgasbord", 0.8694638694638694),
      ("München", "Munchen", 0.8821428571428571))
    cases.foreach { case (a, b, exp) =>
      assert(math.abs(jw(a, b) - exp) < 1e-12, s"jw($a, $b) = ${jw(a, b)}")
    }
  }

  test("kernel properties: symmetry, range, identity, single-char window") {
    val words = Seq("cold", "widget", "large", "bolt", "blue", "rod",
      "co1d", "wdget", "bollt", "a", "ab", "")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a), s"symmetry for ($a, $b)")
      if (a == b && a.nonEmpty) assert(s == 1.0)
    }
    assert(jw("a", "a") == 1.0) // window clamps at 0, same-pos match
  }

  test("interpreted eval and whole-stage codegen agree on the part-name pair grid") {
    import spark.implicits._
    val names = Tables.part(spark, sf0_001).select(col("p_name"))
      .distinct().as[String].collect().sorted
    val pairs = for (a <- names; b <- names if a < b) yield (a, b)
    val viaPlan = pairs.toSeq.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.plans.JaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(viaPlan((a, b)) == jw(a, b), s"codegen drift on ($a, $b)")
    }
  }

  test("x159: two-pass blocking achieves full recall vs brute-force all-pairs at the 0.85 threshold") {
    val got = SparkEntry.queries("x159_fuzzy_names")(spark, sf0_001)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    import spark.implicits._
    val names = Tables.part(spark, sf0_001).select(col("p_name"))
      .distinct().as[String].collect()
    val exp = (for {
      a <- names; b <- names if a < b
      s = BigDecimal(jw(a, b) + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if s >= 0.85
    } yield (a, b)).toSet
    assert(got == exp,
      "blocked candidates must find exactly the all-pairs matches here")
    assert(got.nonEmpty)
  }
}
