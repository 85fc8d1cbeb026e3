package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Flagship

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in [[queries]]
  * and (when ANSI-SQL-expressible) a DuckDB oracle in [[oracleSql]]. Column
  * names are aliased identically on both sides: the driver's compare sorts
  * columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_flagship" -> ((s, dir) => Flagship(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (plain table names). Omit for
    * non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_flagship" -> Flagship.oracle
  )
}
