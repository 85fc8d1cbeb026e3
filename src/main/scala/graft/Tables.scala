package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata
  * (`/root/testdata/sf*`; see FIXTURES.md §B).
  *
  * All operators take the sf directory as a parameter so the same code runs
  * at any scale factor. Reads are plain parquet scans: Catalyst pushes
  * predicates + column pruning into the scan, which is the at-scale
  * equivalent of the reference's B-tree/GIST index pruning
  * (reference: etl.py:224-249; see SURVEY.md §4).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for (PARQUET_TYPE_ILLEGAL). Read it as long nanos and convert to a
    * microsecond TimestampType — all downstream uses (to_date, ordering,
    * windows) are at second granularity, and dedup orderings always add an
    * explicit id tiebreak so the nano→micro truncation can never change a
    * result. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` = integer division. A plain `/` would promote to double,
        // whose 53-bit mantissa cannot hold ~1.7e18 ns (ulp 256 ns) — rows
        // within 128 ns of a midnight would round across the day boundary
        // and break daily aggregates vs the exact-ns oracle.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
