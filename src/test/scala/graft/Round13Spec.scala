package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 pins: O(Δ) streaming state folds (append-only deltas +
  * compaction — batch k must never rewrite batch k−1's files), the
  * vacuum's UNKNOWN-age surfacing, and the de-stringed classifier
  * oracle generator.
  */
class Round13Spec extends AnyFunSuite {
  import SparkTestSession._

  // ---- vacuum: UNKNOWN entries surfaced with age, never deleted ----

  test("vacuum: UNKNOWN entries are never in any delete set but always in the manifest with an age") {
    import operators.ArtifactVacuum
    val wh = java.nio.file.Files.createTempDirectory("r13wh")
    val unknown = "someone_elses_experiment"
    java.nio.file.Files.createDirectories(wh.resolve(unknown))
    val roots = ArtifactVacuum.liveRoots(sf0_001)
    // even the most aggressive sweep must refuse the unknown entry
    val swept = ArtifactVacuum.vacuum(wh.toString, roots,
      sweepScratch = true).toSet
    assert(!swept.contains(unknown),
      "UNKNOWN entries must never be deleted, even with sweepScratch")
    assert(java.nio.file.Files.exists(wh.resolve(unknown)))
    Publish.deleteTree(wh)

    // ... and the real manifest carries every unknown warehouse entry
    // with a non-null age_days (what the sweep refuses to touch must at
    // least be visible)
    val rows = operators.ArtifactVacuum.manifest(spark, sf0_001).collect()
    val unknowns = rows.filter(_.getAs[String]("family") == "unknown")
    unknowns.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("age_days")),
        s"unknown entry ${r.getAs[String]("live_dir")} must carry an age")
      assert(r.getAs[String]("live_dir").nonEmpty)
    }
    // family rows keep a null age (age is an unknown-entry diagnostic)
    rows.filter(_.getAs[String]("family") != "unknown").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("age_days")))
    }
  }

  test("vacuum: liveRoots leases a sibling root that has only a non-documents source table") {
    import operators.ArtifactVacuum
    val parent = java.nio.file.Files.createTempDirectory("r13roots")
    val a = parent.resolve("sfA"); val b = parent.resolve("sfB")
    java.nio.file.Files.createDirectories(a)
    java.nio.file.Files.createDirectories(b)
    // root A is the queried dir; root B carries ONLY events.parquet —
    // before r13 it was not leased and its artifacts were deletable
    java.nio.file.Files.createFile(b.resolve("events.parquet"))
    val roots = ArtifactVacuum.liveRoots(a.toString)
    assert(roots.map(_.getFileName.toString).contains("sfB"),
      s"events-only sibling must be a live root: $roots")
    Publish.deleteTree(parent)
  }

  // ---- classifier oracle generator: shared head, no string surgery ----

  test("x209 oracle chain is generated from the shared head, not sliced from the full chain") {
    val head = operators.Quality.logitHeadSql
    assert(operators.Quality.logitCteSql.startsWith(head + ", z1 AS"),
      "full-corpus chain = shared head + epoch CTEs")
    assert(operators.Quality.logitTrainCteSql.startsWith(head + ", trsel AS"),
      "split-trained chain = the SAME shared head + train-split CTEs")
    assert(operators.Quality.logitTrainCteSql.contains(
      s"tw${operators.Quality.Epochs} AS MATERIALIZED"),
      "split chain must reach the final epoch weight CTE")
  }
}
