package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0_001 = "/root/testdata/sf0.001"
  val sf0_01  = "/root/testdata/sf0.01"
}

class FlagshipSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("flagship covers every bucket and counts all in-range events") {
    val df = operators.Flagship(spark, sf0_001).collect()
    assert(df.length == 10) // 10 buckets, all preserved even if empty
    val total = df.map(_.getAs[Long]("n_events")).sum
    val nEvents = Tables.events(spark, sf0_001)
      .filter("value >= 0 and value < 500").count()
    assert(total == nEvents) // buckets partition the value domain
  }

  test("every declared query has rows and never plans a cartesian product (sf0.001)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0_001)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      // a CartesianProductExec anywhere means a candidate-generation or
      // join path degenerated to all-pairs — fatal at 100 TB
      val cartesians = PlanWalk.collectAll(df.queryExecution.executedPlan)
        .filter(_.isInstanceOf[
          org.apache.spark.sql.execution.joins.CartesianProductExec])
      assert(cartesians.isEmpty, s"$name planned a cartesian product")
    }
  }
}
