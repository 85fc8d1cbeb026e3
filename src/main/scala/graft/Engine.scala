package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.operators.{Flagship, Matview, Merge}

/** User-facing facade mirroring the reference's three entry points, so a
  * user of pi-sister/seng550_a3-etl can switch 1:1:
  *
  *  - `python etl.py`              → [[Engine.runEtl]]   (load + derive +
  *    incremental fact merge, with the reference's count verification)
  *  - `streamlit run viz.py`       → [[Engine.dashboard]] (the dashboard's
  *    filter → count → metrics pipeline as DataFrames)
  *  - `python performance_test.py` → [[graft.Bench]]
  *
  * All heavy lifting delegates to the operator modules; this class only
  * sequences them the way the reference's mains do.
  */
final class Engine(spark: SparkSession, dataDir: String) {

  /** ETL run (reference etl.py:331-384): derive the daily dimension, build
    * the deduped denormalized fact, persist both, verify row counts.
    * Re-running is the reference's freshness model — the fact build is the
    * M1 keep-latest merge, so newer rows win (idempotent). */
  def runEtl(outDir: String): Map[String, Long] = {
    val daily = Flagship.daily(spark, dataDir)
    daily.write.mode("overwrite").parquet(s"$outDir/daily")
    val factPath = Matview.factPath(spark, dataDir)
    val counts = Map(
      "daily" -> spark.read.parquet(s"$outDir/daily").count(),
      "fact" -> spark.read.parquet(factPath).count(),
      "events" -> Tables.events(spark, dataDir).count())
    // reference etl.py:214-218: verify every load produced rows
    require(counts.values.forall(_ > 0), s"ETL verification failed: $counts")
    counts
  }

  /** Dashboard pipeline (reference viz.py): interactive filters over the
    * fact table → per-bucket counts (choropleth analog) + summary metrics.
    * The fact parquet plays the cached `accident_facts` frame. */
  def dashboard(
      dateFrom: String = "2024-01-01", dateTo: String = "2024-12-31",
      eventTypes: Seq[String] = Nil, minValue: Double = 0.0): DashboardResult = {
    val fact = spark.read.parquet(Matview.factPath(spark, dataDir))
    val filtered = fact
      .filter(col("day").between(dateFrom, dateTo))          // P6
      .transform(df => if (eventTypes.isEmpty) df
        else df.filter(col("event_type").isin(eventTypes: _*))) // P7
      .filter(col("value") >= minValue)                      // P8/P9
    val perBucket = Flagship.buckets(spark)
      .join(filtered.groupBy(col("lo"), col("hi"))
        .agg(count(lit(1)).as("cnt")), Seq("lo", "hi"), "left")
      .select(col("lo"), col("hi"),
        coalesce(col("cnt"), lit(0L)).as("n_events"))        // J3/P11
      .orderBy(col("lo"))
    val metrics = filtered.agg(
      count(lit(1)).as("n_rows"),                            // A4
      Num.roundOut(avg(col("value")), 4).as("avg_value"),    // A5
      Num.roundOut(median(col("value")), 4).as("med_value")) // A6
    DashboardResult(filtered, perBucket, metrics)
  }

  /** Incremental refresh (reference etl.py:317-327): merge a new slice of
    * events into an existing fact snapshot, newer rows winning. */
  def refreshFact(existing: DataFrame, incoming: DataFrame): DataFrame =
    Merge.upsert(existing, incoming, Seq("user_id", "event_type"),
      Seq(col("ts").desc, col("event_id").desc))
}

final case class DashboardResult(
    filtered: DataFrame, perBucket: DataFrame, metrics: DataFrame)
