package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The facade sequences the reference's entry points correctly. */
class EngineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("runEtl derives, persists, and verifies (etl.py main analog)") {
    val out = java.nio.file.Files.createTempDirectory("etl").toString
    val counts = new Engine(spark, sf0_001).runEtl(out)
    assert(counts("events") == 1000L)
    assert(counts("daily") > 0 && counts("fact") > 0)
    // fact is deduped: one row per (user_id, event_type)
    val fact = spark.read.parquet(
      operators.Matview.factPath(spark, sf0_001))
    assert(fact.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("dashboard filters + bucket counts + metrics (viz.py analog)") {
    val engine = new Engine(spark, sf0_001)
    engine.runEtl(java.nio.file.Files.createTempDirectory("etl2").toString)
    // keep-latest dedup concentrates fact rows at month end — use a window
    // that overlaps it
    val r = engine.dashboard(
      dateFrom = "2024-01-15", dateTo = "2024-01-31",
      eventTypes = Seq("click", "purchase"), minValue = 10.0)
    val buckets = r.perBucket.collect()
    assert(buckets.length == 10) // all dimension rows preserved
    val total = buckets.map(_.getAs[Long]("n_events")).sum
    assert(total == r.filtered.count())
    val m = r.metrics.head()
    assert(m.getAs[Long]("n_rows") == total)
    assert(m.getAs[Double]("avg_value") >= 10.0)
  }

  test("refreshFact: newer incoming wins, older loses (upsert analog)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val engine = new Engine(spark, sf0_001)
    val existing = Seq((10L, t(5), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val incoming = Seq(
      (11L, t(1), 1L, "click", 2.0), // older → must lose
      (12L, t(9), 1L, "click", 3.0)) // newer → must win
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ids = engine.refreshFact(existing, incoming)
      .select("event_id").as[Long].collect().toSeq
    assert(ids == Seq(12L))
  }
}
