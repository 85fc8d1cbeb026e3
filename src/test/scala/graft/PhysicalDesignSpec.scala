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

  test("w06: compaction collapses the fragmented layout losslessly") {
    val frag = PhysicalDesign.fragmentedEventsPath(spark, sf)
    val compact = PhysicalDesign.compactedEventsPath(spark, sf)
    val nFrag = PhysicalDesign.parquetFileCount(frag)
    val nCompact = PhysicalDesign.parquetFileCount(compact)
    info(s"fragmented: $nFrag files, compacted: $nCompact files")
    assert(nFrag >= 32, s"fragmented fixture should have many files: $nFrag")
    assert(nCompact * 4 <= nFrag,
      s"compaction should collapse the file count: $nFrag -> $nCompact")
    // lossless: same rows, same content digest over all columns
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(compact)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compacted content must equal fragmented content")
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

  test("w05: z-clustered files bound BOTH dims; single-column sort doesn't") {
    import org.apache.spark.sql.functions._
    // Per-file bounding boxes via input_file_name(): the z layout must
    // constrain the value-bucket extent per file (so a value-range
    // predicate can skip files), while a day-sorted layout leaves it at
    // ~full range. Comparative assertion — robust to range-sampling noise.
    def extents(path: String): (Double, Double) = {
      val row = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("za")) - min(col("za"))).as("ea"),
          (max(col("zb")) - min(col("zb"))).as("eb"))
        .agg(avg(col("ea")), avg(col("eb")))
        .head()
      (row.getDouble(0), row.getDouble(1))
    }
    val zPath = PhysicalDesign.zorderEventsPath(spark, sf)
    val dayDir = java.nio.file.Files.createTempDirectory("daysort").toString
    PhysicalDesign.zKeyed(Tables.events(spark, sf))
      .repartitionByRange(8, col("za"))
      .sortWithinPartitions(col("za"))
      .write.mode("overwrite").parquet(dayDir)
    val (zDay, zVb) = extents(zPath)
    val (linDay, linVb) = extents(dayDir)
    info(s"z layout: day extent $zDay, vb extent $zVb")
    info(s"day-sorted: day extent $linDay, vb extent $linVb")
    // z-clustered: value extent per file must be materially bounded vs the
    // day-sorted layout (where each file spans the fixture's full value
    // spread — that's why its value predicates can never skip files)
    assert(zVb < 0.75 * linVb, s"z layout must bound vb: z=$zVb lin=$linVb")
    // and the day dimension stays bounded below the full month too
    assert(zDay < 30, s"z layout must bound day extent, got $zDay")
    assert(linDay < zDay, "day sort should bound day tighter than z does")
  }
}
