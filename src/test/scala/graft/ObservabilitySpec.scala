package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `observe()` pipeline-metrics contract: named aggregates ride
  * along with the job (collected by an AggregatingAccumulator per task)
  * instead of a second scan — at 100 TB the difference between "row
  * counts and null rates for free" and "double the I/O". The metrics
  * must equal a separately-computed aggregate, and they measure the
  * stream AT the observe point (before downstream filters). */
class ObservabilitySpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf = "/root/testdata/sf0.001"

  test("observe() metrics match a standalone aggregate and see pre-filter rows") {
    val events = Tables.events(spark, sf)
    val expected = events.agg(
      count(lit(1)).as("n"),
      sum(col("value")).as("sv"),
      count(when(col("value").isNull, 1)).as("nulls")).head()

    val obs = Observation("ingest_metrics")
    val observed = events.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col("value")).as("sum_value"),
      count(when(col("value").isNull, 1)).as("n_null_value"))
    // downstream filter: metrics must still reflect the FULL observed
    // stream, proving they're collected where the probe sits in the plan
    val kept = observed.filter(col("event_type") === "click").count()
    val m = obs.get

    assert(m("n_rows") == expected.getLong(0))
    // double sum: accumulator merge order (task completion) vs exchange
    // merge order can differ in the last ulp — tolerance, not equality
    assert(math.abs(m("sum_value").asInstanceOf[Double] - expected.getDouble(1)) < 1e-6)
    assert(m("n_null_value") == expected.getLong(2))
    assert(kept < expected.getLong(0), "filter actually dropped rows")
  }
}
