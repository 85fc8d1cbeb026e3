package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and edge-semantics pins for the round-6 Classic (TPC-H
  * silhouettes) and Mining (corpus ops) batches. Values are oracle-checked
  * (CORRECTNESS gate); these tests pin the SCALE claims the Scaladoc
  * makes — broadcasts, pushdown, single-fact-shuffle — plus semantics the
  * oracle can't isolate.
  */
class ClassicAndMiningSpec extends AnyFunSuite {
  import SparkTestSession._
  import PlanWalk._

  test("q68 pricing summary: no join, shipdate filter reaches the scan, one fact shuffle") {
    val nodes = executedAll(SparkEntry.queries("q68_pricing_summary")(spark, sf0_001))
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("l_shipdate"))),
      s"shipdate not pushed: ${scans.map(_.metadata.get("PushedFilters"))}")
    // scan → partial agg → single exchange (plus the 1-partition sort for
    // ORDER BY presentation) — the fact itself crosses the wire once
    val exchanges = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(exchanges <= 2, s"expected ≤2 exchanges (agg + presentation sort), got $exchanges")
  }

  test("q72 priority check: EXISTS plans as a semi join, never a cartesian") {
    val nodes = executedAll(SparkEntry.queries("q72_priority_check")(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    val semis = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.toString.contains("LeftSemi") => j
    }
    assert(semis.nonEmpty, "expected a LeftSemi join for the EXISTS")
  }

  test("q75 disjunct revenue: part dim broadcasts; brand disjunction prunes the dim before the join") {
    val nodes = executedAll(SparkEntry.queries("q75_disjunct_revenue")(spark, sf0_001))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "filtered part dim must broadcast")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("q71 returned items: top-20 runs as TakeOrderedAndProject, not a global sort") {
    val nodes = executedAll(SparkEntry.queries("q71_returned_items")(spark, sf0_001))
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"expected distributed top-k, plan: ${nodes.map(_.nodeName).distinct}")
  }

  test("q73 histogram: every customer is represented (left join keeps zero-order customers)") {
    val out = SparkEntry.queries("q73_cust_order_dist")(spark, sf0_001)
      .agg(sum(col("custdist"))).collect()(0).getLong(0)
    val nCust = Tables.customer(spark, sf0_001).count()
    assert(out == nCust, s"histogram covers $out of $nCust customers")
  }

  test("x47 edit near-dup: pair generation is block-bounded (no cartesian) and symmetric-free") {
    val df = SparkEntry.queries("x47_edit_neardup")(spark, sf0_001)
    val nodes = executedAll(df)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    val rows = df.collect()
    // a < b canonical ordering means no pair appears twice
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("x48 bm25: zero-tf docs score 0 and never enter the top-k above a matching doc") {
    val rows = SparkEntry.queries("x48_bm25")(spark, sf0_001).collect()
    assert(rows.nonEmpty)
    // scores are non-increasing in output order
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every returned doc matched at least one query term
    assert(rows.forall(r => r.getAs[Long]("tf_spark") + r.getAs[Long]("tf_join")
      + r.getAs[Long]("tf_window") > 0))
  }

  test("x49 word lift: model stats broadcast — no shuffle of the corpus for dfreq joins") {
    val nodes = executedAll(SparkEntry.queries("x49_word_lift")(spark, sf0_001))
    val bcasts = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bcasts >= 3, s"vocab + 2×dfreq should broadcast, got $bcasts broadcast joins")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("x46 bigram lm: scorer sees every document exactly once") {
    val out = SparkEntry.queries("x46_bigram_lm")(spark, sf0_001)
    val n = out.count()
    val nDocs = Tables.documents(spark, sf0_001)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(n == nDocs, s"scored $n of $nDocs multi-token docs")
    // oov_rate bounded [0,1]; cond_prob strictly positive (add-one smoothing)
    val rows = out.collect()
    assert(rows.forall(r => r.getAs[Double]("oov_rate") >= 0.0 &&
      r.getAs[Double]("oov_rate") <= 1.0))
    assert(rows.forall(_.getAs[Double]("cond_prob") > 0.0))
  }
}
