package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.plans.{TopKPerGroup, TopKPerGroupExec}

/** Pins the native top-k-per-group operator ([[graft.plans.TopKPerGroup]]):
  * result equality with the declarative row_number form (the q88 oracle
  * re-proves this against DuckDB per round; this pins it in-engine with
  * asc/desc variants), and the plan shape the operator exists for — two
  * exec phases, the exchange between them, and NO SortExec anywhere
  * (the window form's full group sort is what the heaps replace). */
class TopKSpec extends AnyFunSuite {
  import SparkTestSession._
  import PlanWalk._

  private def events = Tables.events(spark, sf0_001)
    .select(col("event_type"), col("event_id"), col("value"))
    .filter(col("value").isNotNull)

  private def windowForm(k: Int, desc: Boolean) = {
    val o = if (desc) Seq(col("value").desc, col("event_id")) else
      Seq(col("value"), col("event_id"))
    events.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(o: _*)))
      .filter(col("rn") <= k).drop("rn")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("native top-k == window row_number form (desc and asc, several k)") {
    for (k <- Seq(1, 3, 64); desc <- Seq(true, false)) {
      val native = TopKPerGroup(events, Seq("event_type"),
        Seq("value" -> desc, "event_id" -> false), k)
      assert(rows(native) == rows(windowForm(k, desc)), s"k=$k desc=$desc")
    }
  }

  test("plan: partial + final exec, one exchange between, no sort") {
    val df = TopKPerGroup(events, Seq("event_type"),
      Seq("value" -> true, "event_id" -> false), 3)
    val nodes = executedAll(df)
    val execs = nodes.collect { case t: TopKPerGroupExec => t }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final, got ${execs.map(_.partial)}")
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      "exactly one exchange (between the phases)")
    assert(!nodes.exists(_.isInstanceOf[SortExec]),
      "no full sort anywhere — the heaps replace it")
  }

  test("partial phase bounds rows crossing the exchange") {
    // with one input partition per event_type worth of data spread over
    // 4 partitions, the partial phase emits at most k rows per group per
    // partition — strictly fewer than the input when groups are large
    val df = TopKPerGroup(events, Seq("event_type"),
      Seq("value" -> true, "event_id" -> false), 3)
    val nodes = executedAll(df)
    val partial = nodes.collect {
      case t: TopKPerGroupExec if t.partial => t }.head
    val partialRows = partial.execute().count()
    val inputRows = events.count()
    val groups = 5L // event types
    assert(partialRows <= 3 * groups * spark.sparkContext.defaultParallelism)
    assert(partialRows < inputRows, "partial genuinely reduces")
  }

  test("groups smaller than k keep every row") {
    val tiny = events.limit(4)
    val native = TopKPerGroup(tiny, Seq("event_type"),
      Seq("value" -> true, "event_id" -> false), 100)
    assert(native.count() == 4)
  }
}
