package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-6 scale claims: the new pair/candidate
  * generators stay equi-join-shaped (never cartesian/nested-loop), and
  * the multimodal packer's windows are shard-partitioned (a global
  * window would serialize the corpus onto one task — the x18 lesson,
  * re-asserted for every new windowed operator). */
class Round6PlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import PlanWalk._

  private def noCartesian(name: String): Unit = {
    val nodes = executedAll(SparkEntry.queries(name)(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      s"$name plans a cartesian product")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"$name plans a nested-loop join")
  }

  test("round-6 pair generators never plan cartesian/nested-loop joins") {
    // x63: band-chunk equi-join; x65: inverted-index gram join;
    // x68: bucket equi-join; x70: (doc, position) equi-join
    Seq("x63_simhash_portable", "x65_rouge_attribution",
      "x68_triplet_mining", "x70_skipgram_pairs").foreach(noCartesian)
  }

  test("m07 batch assembly: every window is partitioned (no global window)") {
    val nodes = executedAll(SparkEntry.queries("m07_batch_assembly")(spark, sf0_001))
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "packing runs through a window")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, "unpartitioned window in m07"))
  }

  test("x64/st09 sample windows are salted or group-partitioned, never global") {
    Seq("x64_quantile_sample", "st09_stream_quantile").foreach { name =>
      val nodes = executedAll(SparkEntry.queries(name)(spark, sf0_001))
      val windows = nodes.collect { case w: WindowExec => w }
      windows.foreach(w =>
        assert(w.partitionSpec.nonEmpty, s"unpartitioned window in $name"))
    }
  }
}
