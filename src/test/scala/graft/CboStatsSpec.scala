package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer statistics surface: ANALYZE TABLE feeds catalog
  * row/column stats, and with CBO enabled the optimizer derives a
  * SELECTIVITY estimate for filters instead of guessing from raw bytes.
  * At 100 TB this is what lets Catalyst pick broadcast sides and join
  * orders from evidence — the reference delegates the same job to
  * PostgreSQL's ANALYZE (SURVEY.md §4). */
class CboStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ANALYZE TABLE row + column stats drive filter cardinality estimates") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    // plan .stats reads SQLConf from the thread-local ACTIVE session —
    // without this the parent session's cbo=false applies and every
    // rowCount comes back None
    org.apache.spark.sql.classic.SparkSession.setActiveSession(
      ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val tmp = java.nio.file.Files.createTempDirectory("cbo").toString + "/orders"
    Tables.orders(ss, sf0_001).write.mode("overwrite").parquet(tmp)
    ss.sql("DROP TABLE IF EXISTS cbo_orders")
    ss.sql(s"CREATE TABLE cbo_orders USING parquet LOCATION '$tmp'")
    try {
      ss.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
      ss.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS " +
        "o_orderstatus, o_custkey")

      val base = ss.table("cbo_orders").queryExecution.optimizedPlan.stats
      val total = Tables.orders(ss, sf0_001).count()
      assert(base.rowCount.contains(BigInt(total)),
        s"catalog row count ${base.rowCount} != $total")

      // a selective equality filter: the estimate must come in UNDER the
      // table row count and over zero (histogram/NDV-driven, not a guess)
      val est = ss.table("cbo_orders")
        .filter(col("o_orderstatus") === "F")
        .queryExecution.optimizedPlan.stats
      assert(est.rowCount.isDefined, "CBO produced no cardinality estimate")
      assert(est.rowCount.get > 0 && est.rowCount.get < total,
        s"filter estimate ${est.rowCount} not in (0, $total)")

      // column NDV recorded for the join key — the input join reorder and
      // broadcast decisions read
      val ndv = ss.sql("DESC EXTENDED cbo_orders o_custkey").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(ndv.get("distinct_count").exists(_.toLong > 0))
    } finally {
      ss.sql("DROP TABLE IF EXISTS cbo_orders")
      org.apache.spark.sql.classic.SparkSession.setActiveSession(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    }
  }
}
