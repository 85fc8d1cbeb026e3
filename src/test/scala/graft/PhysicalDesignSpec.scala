package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PhysicalDesign

/** Physical-property pins for the layout operators: these assert the PLAN,
  * not just the values — pruning must reach the file index, bucketing must
  * delete the join exchanges. Values are oracle-checked (w01/w02). */
class PhysicalDesignSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf = "/root/testdata/sf0.001"

  import PlanWalk.collectAll

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan
  }

  test("w01: the date filter prunes the partitioned scan to 10 day= dirs") {
    val df = PhysicalDesign.prunedDaily(spark, sf)
    val scans = collectAll(executed(df)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters pushed: ${scan.partitionFilters}")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 10, s"expected 10 pruned day partitions, got $selected")
  }

  test("w02: bucketed join plans with zero shuffle exchanges") {
    val df = PhysicalDesign.bucketedJoin(spark, sf)
    val plan = executed(df)
    val joins = collectAll(plan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a SortMergeJoinExec in:\n$plan")
    val shufflesUnderJoin = joins.flatMap(collectAll).collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle, found: $shufflesUnderJoin")
    // the final presentation sort may shuffle; the JOIN subtree may not
  }
}
