package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo
import graft.plans.{StContains, StContainsRings}

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

  // square ring helper: closed, counter-clockwise
  private def sq(x0: Double, y0: Double, x1: Double, y1: Double) = array(
    Geo.makePoint(lit(x0), lit(y0)), Geo.makePoint(lit(x1), lit(y0)),
    Geo.makePoint(lit(x1), lit(y1)), Geo.makePoint(lit(x0), lit(y1)),
    Geo.makePoint(lit(x0), lit(y0)))

  // outer [0,10]² with hole [4,6]², plus disjoint part [20,30]×[0,10]
  private val multiRings = array(sq(0, 0, 10, 10), sq(4, 4, 6, 6), sq(20, 0, 30, 10))

  test("multi-ring even-odd: hole is outside, shell is inside, second part is inside") {
    val probes = Seq(
      (5.0, 5.0, false),  // dead center of the hole -> outside
      (2.0, 2.0, true),   // between outer ring and hole -> inside
      (5.0, 9.0, true),   // inside outer, above the hole -> inside
      (25.0, 5.0, true),  // disjoint second part -> inside
      (15.0, 5.0, false), // gap between the parts -> outside
      (40.0, 5.0, false)) // far outside everything -> outside
    probes.foreach { case (x, y, want) =>
      val got = spark.range(1)
        .select(StContainsRings(multiRings, lit(x), lit(y)).as("inside"))
        .head().getBoolean(0)
      assert(got == want, s"($x, $y) expected $want")
    }
  }

  test("multi-ring native expression agrees with XOR of per-ring UDF on all sf0.001 points") {
    // even-odd parity over all rings == XOR of each ring's own even-odd
    // result, so the single-ring UDF composes into the differential partner
    val rings = Seq(sq(0, 0, 10, 10), sq(4, 4, 6, 6), sq(20, 0, 30, 10))
    val pts = Tables.events(spark, sf0_001).select(
      (col("value") % 50).as("px"),
      (col("user_id") % 50).cast("double").as("py"))
    val perRingXor = rings
      .map(r => Geo.stContains(r, col("px"), col("py")))
      .reduce(_ =!= _) // boolean XOR
    val diff = pts
      .withColumn("u", perRingXor)
      .withColumn("n", StContainsRings(multiRings, col("px"), col("py")))
      .filter(col("u") =!= col("n"))
      .count()
    assert(diff == 0)
  }

  test("MULTIPOLYGON WKT roundtrip preserves rings and containment") {
    // polygon 1 = outer + hole, polygon 2 = disjoint square (same shape as
    // multiRings, grouped); format -> parse must flatten back to 3 rings
    val wkt = Geo.formatMultiPolygonWkt(array(
      array(sq(0, 0, 10, 10), sq(4, 4, 6, 6)), array(sq(20, 0, 30, 10))))
    val df = spark.range(1).select(wkt.as("wkt"))
      .withColumn("rings", Geo.parseRingsWkt(col("wkt")))
    val text = df.head().getString(0)
    assert(text.startsWith("MULTIPOLYGON((("), text)
    assert(df.select(size(col("rings"))).head().getInt(0) == 3)
    val inHole = df.select(
      StContainsRings(col("rings"), lit(5.0), lit(5.0))).head().getBoolean(0)
    val inShell = df.select(
      StContainsRings(col("rings"), lit(2.0), lit(2.0))).head().getBoolean(0)
    assert(!inHole && inShell)
  }

  test("POLYGON-with-holes WKT roundtrip") {
    val wkt = Geo.formatPolygonWktRings(array(sq(0, 0, 10, 10), sq(4, 4, 6, 6)))
    val df = spark.range(1).select(wkt.as("wkt"))
      .withColumn("rings", Geo.parseRingsWkt(col("wkt")))
    assert(df.head().getString(0).startsWith("POLYGON(("))
    assert(df.select(size(col("rings"))).head().getInt(0) == 2)
    assert(!df.select(
      StContainsRings(col("rings"), lit(5.0), lit(5.0))).head().getBoolean(0))
  }

  test("rings expression participates in whole-stage codegen") {
    // probe coordinates derive from the range column so constant folding
    // can't collapse the expression out of the generated code
    val q = spark.range(2).select(
      StContainsRings(multiRings,
        col("id").cast("double") * 2 + 1, lit(2.0)).as("inside"))
    q.collect()
    val stages = PlanWalk.collectAll(q.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("st_contains_rings")),
      q.queryExecution.executedPlan.toString)
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
