package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator query: the Spark program plus (when ANSI-SQL
  * expressible) its DuckDB oracle. Operator objects expose `entries`;
  * [[SparkEntry]] flattens them into the driver contract maps.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Non-SQL-expressible operator: driver records a weaker rows-only check;
    * correctness is pinned by ScalaTest specs instead. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
