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

  /** Schema-adaptive normalizer for the driver's `events.ts` column, which
    * has shipped in three encodings across testdata regenerations:
    *
    *  - parquet TIMESTAMP(NANOS): Spark has no native nanos type
    *    (PARQUET_TYPE_ILLEGAL), so under `legacy.parquet.nanosAsLong` it
    *    reads as `LongType` nanos → convert to microsecond TimestampType.
    *    `div` = integer division: a plain `/` would promote to double,
    *    whose 53-bit mantissa cannot hold ~1.7e18 ns (ulp 256 ns) — rows
    *    within 128 ns of a midnight would round across the day boundary
    *    and break daily aggregates vs the exact-ns oracle.
    *  - parquet TIMESTAMP_NTZ(MICROS) (`isAdjustedToUTC=false`): reads as
    *    `TimestampNTZType` → cast to TimestampType. Under the pinned UTC
    *    session timezone (every entrypoint sets it) the cast reinterprets
    *    the same wall-clock as the same instant, bit-identical micros —
    *    and DuckDB's naive-timestamp oracle agrees by the same rule.
    *  - plain TIMESTAMP(MICROS): already TimestampType → as-is.
    *
    * ONE helper used by both the batch loader and every streaming ingest
    * site, so the next encoding drift is a one-line fix, not seven. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** Events with `ts` normalized to microsecond TimestampType whatever the
    * on-disk encoding (see [[normalizeTs]]). All downstream uses (to_date,
    * ordering, windows) are at second granularity, and dedup orderings
    * always add an explicit id tiebreak, so nano→micro truncation can
    * never change a result. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
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
