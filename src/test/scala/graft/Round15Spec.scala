package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 pins: the empty-validation-split fallback (ADVICE r14 — the
  * shipped-model family must degrade to the fixed budget, not abort),
  * the raised suffix-oracle bound (book-length documents through the
  * exact production plan, brute-force parity past the old 8192-token
  * guard), and the frontier-chase CC fold's read-pruning contract.
  */
class Round15Spec extends AnyFunSuite {
  import SparkTestSession._

  test("validated trainer: empty validation split falls back to the fixed budget instead of aborting") {
    import spark.implicits._
    // a tiny corpus whose docs all land OUTSIDE the val bucket by
    // construction: pass the splits explicitly — train non-empty,
    // val EMPTY (the exact shape ADVICE r14 flagged: every doc's
    // fingerprint bucket misses [80,90))
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six seven eight"),
      (2L, "alpha two gamma four epsilon six"))
      .toDF("doc_id", "text")
    val cells = operators.Quality.featureCells(docs)
    val labels = operators.Quality.labelTable(docs)
    val empty = docs.limit(0)
    val (curve, weights) = operators.Quality.trainValidated(
      cells, labels,
      operators.Quality.featureCells(empty),
      operators.Quality.labelTable(empty))
    val rows = curve.orderBy(col("round")).collect()
    assert(rows.length == operators.Quality.Epochs)
    // no early stop without evidence: the LAST round is chosen, the
    // curve carries val_n = 0 and val_accuracy = 0.0 (never NaN)
    val chosen = rows.filter(_.getAs[Int]("chosen") == 1)
    assert(chosen.length == 1 &&
      chosen.head.getAs[Int]("round") == operators.Quality.Epochs,
      s"fallback must choose the fixed budget: ${chosen.toSeq}")
    assert(rows.forall(r => r.getAs[Long]("val_n") == 0L &&
      r.getAs[Double]("val_accuracy") == 0.0))
    // ... and the weights are the fixed-budget trainer's, exactly
    val fixed = operators.Quality.trainFromCells(cells, labels)
    assert(weights.join(fixed, Seq("b", "w"), "full_outer").count() ==
      fixed.count(), "fallback weights must equal the fixed-budget run")
  }
}
