package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q86 (join-delta IVM with retractions) and st08 (stream-stream
  * left outer): the oracle proves the ANSWERS; these prove the mechanics —
  * the retraction actually removed rows, and the outer join actually
  * emitted never-matched clicks as NULL rows. */
class IvmOuterSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q86: maintained view == full view minus the retracted orders") {
    val out = SparkEntry.queries("q86_join_ivm")(spark, sf0_001).collect()
    assert(out.nonEmpty)
    // the retraction batch is non-empty on the fixture, so SOME nation
    // lost orders: maintained counts must sum strictly under the full set
    val full = Tables.orders(spark, sf0_001)
      .join(Tables.customer(spark, sf0_001),
        col("o_custkey") === col("c_custkey"))
      .count()
    val kept = out.map(_.getLong(1)).sum
    assert(kept < full, s"retraction removed nothing ($kept vs $full)")
    // exact-cents edge conversion: revenue has at most 2 decimals
    out.foreach { r =>
      val cents = BigDecimal(r.getDouble(2)) * 100
      assert((cents - cents.setScale(0, BigDecimal.RoundingMode.HALF_UP))
        .abs < 1e-6, s"non-cent revenue ${r.getDouble(2)}")
    }
  }

  test("st08: unmatched clicks surface as NULL rows; matched part == st04") {
    val outer = SparkEntry.queries("st08_stream_outer_join")(spark, sf0_001)
      .collect()
    val nullRows = outer.filter(_.isNullAt(2))
    assert(nullRows.nonEmpty,
      "no never-converted clicks emitted — the join degenerated to inner")
    // inner component must be a subset of st04's full inner join (st08
    // additionally filters to clicks behind the watermark horizon)
    val inner = outer.filter(!_.isNullAt(2))
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val st04 = SparkEntry.queries("st04_stream_join")(spark, sf0_001)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(inner.subsetOf(st04))
    assert(inner.nonEmpty)
    // and a click is either matched or null-extended, never both
    val matchedClicks = inner.map(_._1)
    assert(nullRows.map(_.getLong(1)).forall(c => !matchedClicks.contains(c)))
  }

  test("x61: every emitted pair involves the append batch") {
    val rows = SparkEntry.queries("x61_incremental_dedup")(spark, sf0_001)
      .collect()
    assert(rows.nonEmpty, "append batch found no duplicate candidates")
    rows.foreach { r =>
      assert(r.getBoolean(2) || r.getBoolean(3),
        "a base-x-base pair leaked into the incremental run")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0 + 1e-9)
    }
    // presentation contract: ranked by verified jaccard descending
    val js = rows.map(_.getDouble(5)).toSeq
    assert(js == js.sortBy(-(_: Double)), "not ranked by jaccard")
    // x39's top-50 pairs that involve an incoming doc must all resurface
    // here (same candidate machinery, x61 only RESTRICTS the pair set —
    // x39's global LIMIT 50 means the reverse containment need not hold)
    val incIds = Tables.documents(spark, sf0_001)
      .filter(graft.functions.Text.fingerprint(col("text")) % 10 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val fullInc = SparkEntry.queries("x39_minhash_portable")(spark, sf0_001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => incIds(a) || incIds(b) }.toSet
    val incPairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fullInc.subsetOf(incPairs),
      "the incremental run missed incoming pairs the full run reports")
  }

  test("x59: exactly one canonical per cluster, and it has max quality") {
    val rows = SparkEntry.queries("x59_cluster_canon")(spark, sf0_001)
      .collect()
    assert(rows.nonEmpty, "fixture has duplicate clusters")
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      assert(members.length >= 2, s"cluster $cid below dup size")
      val canon = members.filter(_.getBoolean(4))
      assert(canon.length == 1, s"cluster $cid has ${canon.length} canons")
      val best = members.map(_.getDouble(3)).max
      assert(canon.head.getDouble(3) == best,
        s"cluster $cid kept a non-best copy")
      assert(members.forall(_.getLong(2) == members.length))
    }
  }
}
