package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo
import graft.plans.StContains

/** The native codegen StContains expression must agree with the reference
  * Scala UDF everywhere, and work registered as a SQL function. */
class StContainsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native expression agrees with the UDF on all sf0.001 event points") {
    val ring = array(
      Geo.makePoint(lit(10.005), lit(0.5)), Geo.makePoint(lit(19.995), lit(0.5)),
      Geo.makePoint(lit(19.995), lit(49.5)), Geo.makePoint(lit(10.005), lit(49.5)),
      Geo.makePoint(lit(10.005), lit(0.5)))
    val pts = Tables.events(spark, sf0_001).select(
      (col("value") % 50).as("px"),
      (col("user_id") % 50).cast("double").as("py"))
    val diff = pts.withColumn("u", Geo.stContains(ring, col("px"), col("py")))
      .withColumn("n", StContains(ring, col("px"), col("py")))
      .filter(col("u") =!= col("n"))
      .count()
    assert(diff == 0)
    val inside = pts.filter(StContains(ring, col("px"), col("py"))).count()
    assert(inside > 0)
  }

  test("registered SQL function evaluates via the expression") {
    StContains.register(spark)
    val got = spark.sql(
      """SELECT st_contains_ring(
        |  array(struct(0.0D AS x, 0.0D AS y), struct(10.0D AS x, 0.0D AS y),
        |        struct(10.0D AS x, 10.0D AS y), struct(0.0D AS x, 10.0D AS y),
        |        struct(0.0D AS x, 0.0D AS y)),
        |  5.0D, 5.0D) AS inside""".stripMargin).head().getBoolean(0)
    assert(got)
  }
}
