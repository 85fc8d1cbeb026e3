package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in [[queries]]
  * and (when ANSI-SQL-expressible) a DuckDB oracle in [[oracleSql]]. Column
  * names are aliased identically on both sides: the driver's compare sorts
  * columns by name before hashing. Float aggregates are rounded identically
  * on both sides to mask summation-order drift.
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    Flagship.entries ++ Matview.entries ++
    Projections.entries ++
    Joins.entries ++
    Aggregates.entries ++
    Windows.entries ++
    Breadth.entries ++
    Merge.entries ++
    GeoQueries.entries ++
    Sources.entries ++
    Pivots.entries ++
    PhysicalDesign.entries ++
    ArtifactVacuum.entries ++
    Typed.entries ++
    Supply.entries ++
    Classic.entries ++
    Dedup.entries ++
    Similarity.entries ++
    TextAnalysis.entries ++
    Quality.entries ++
    Corpus.entries ++
    Mining.entries ++
    Tokens.entries ++
    Analytics.entries ++
    Contracts.entries ++
    Pareto.entries ++
    Multimodal.entries ++
    graft.streaming.Streams.entries

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (plain table names). Omitted keys are
    * non-SQL-expressible ops → driver records a rows-only check; those are
    * pinned by ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
