package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo
import graft.operators.GeoQueries
import graft.plans.StDWithinSql

/** Pins [[graft.plans.StDWithinSql]]'s two claims: the expansion is
  * semantically exactly `haversineKm <= r` (the band never prunes a true
  * row), and with a literal probe point the band reaches the parquet scan
  * as PushedFilters range predicates on the stored lat column — the
  * reference's GIST-index pruning (etl.py:230-237) via row-group stats. */
class GeoPushdownSpec extends AnyFunSuite {
  import SparkTestSession._
  import PlanWalk._

  test("st_dwithin == haversineKm <= r (band is sound, never prunes a hit)") {
    StDWithinSql.register(spark)
    val pts = GeoQueries.pointsTable(spark, sf0_001)
    // a radius that splits the data (sf0.001 lat lives in [-90,-76])
    val viaFn = pts.filter(expr("st_dwithin(lat, lon, -82.0, 0.0, 700.0)"))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val direct = pts.filter(
        Geo.haversineKm(col("lat"), col("lon"), lit(-82.0), lit(0.0)) <= 700.0)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(viaFn == direct)
    assert(viaFn.nonEmpty && viaFn.size < pts.count(), "radius splits the data")
  }

  test("literal probe point: latitude band reaches the scan as PushedFilters") {
    StDWithinSql.register(spark)
    val df = GeoQueries.pointsTable(spark, sf0_001)
      .filter(expr("st_dwithin(lat, lon, -82.0, 0.0, 700.0)"))
    val scans = executedAll(df).collect { case f: FileSourceScanExec => f }
    val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(p =>
      p.contains("GreaterThanOrEqual(lat") && p.contains("LessThanOrEqual(lat")),
      s"lat band not pushed: $pushed")
  }

  test("non-literal probe point: falls back to the abs-band form, same rows") {
    StDWithinSql.register(spark)
    val pts = GeoQueries.pointsTable(spark, sf0_001)
    // probe point from columns (self-distance 0 <= r): every row survives
    val self = pts.filter(expr("st_dwithin(lat, lon, lat, lon, 1.0)"))
    assert(self.count() == pts.count())
  }
}
