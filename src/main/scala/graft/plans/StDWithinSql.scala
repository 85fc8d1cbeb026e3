package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._

/** `st_dwithin(lat1, lon1, lat2, lon2, r_km)` — PostGIS `ST_DWithin`
  * (reference queries.py:182-186) as a SQL function whose expansion
  * CARRIES ITS OWN INDEX: a sound latitude bounding-band conjunct ahead
  * of the exact haversine test. This closes SURVEY §4's one open rewrite
  * candidate ("push a bounding-box conjunct under the containment
  * predicate automatically") — the reference leaned on a GIST index for
  * exactly this pruning; here the function's own expansion produces it.
  *
  * When the probe point and radius are foldable literals the band is
  * emitted in INTERVAL form (`lat BETWEEN lat2-pad AND lat2+pad`):
  * constant folding collapses the bounds to literals, so the conjunct
  * reaches the parquet scan as `PushedFilters` range predicates — the
  * row-group min/max skip that stands in for the reference's spatial
  * index (GeoPushdownSpec pins the plan). With non-literal points it
  * degrades to the `abs(Δlat)·111 ≤ r` form, still short-circuiting the
  * trig on every out-of-band row (`And` evaluates left-first in codegen).
  *
  * Soundness: great-circle distance ≥ meridian distance = |Δlat|·(πR/180
  * ≈ 111.195 km/deg). Dividing by 111.0 (< 111.195) widens the band, so
  * no true within-r row is ever pruned; the exact test then decides.
  * NULL inputs propagate NULL through band and exact test identically.
  */
object StDWithinSql {

  /** km per degree of latitude, rounded DOWN so the band over-covers. */
  private val KmPerDegLat = 111.0

  val build: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 5, "st_dwithin(lat1, lon1, lat2, lon2, r_km)")
    val (lat1, lon1, lat2, lon2, r) =
      (exprs(0), exprs(1), exprs(2), exprs(3), exprs(4))
    // catalyst nodes directly (a Column-DSL roundtrip leaves unresolvable
    // ColumnNode placeholders when run inside a function builder)
    val km = Literal(KmPerDegLat)
    def sq(e: Expression) = Multiply(e, e)
    def interval(col: Expression, ctr: Expression): Expression = {
      val pad = Divide(r, km)
      And(GreaterThanOrEqual(col, Subtract(ctr, pad)),
        LessThanOrEqual(col, Add(ctr, pad)))
    }
    val band =
      if (r.foldable && lat2.foldable && !lat1.foldable) interval(lat1, lat2)
      else if (r.foldable && lat1.foldable && !lat2.foldable) interval(lat2, lat1)
      else LessThanOrEqual(Multiply(Abs(Subtract(lat1, lat2)), km), r)
    // exact great-circle test, same arithmetic shape as Geo.haversineKm
    val dLat = Divide(ToRadians(Subtract(lat2, lat1)), Literal(2.0))
    val dLon = Divide(ToRadians(Subtract(lon2, lon1)), Literal(2.0))
    val a = Add(sq(Sin(dLat)),
      Multiply(Multiply(Cos(ToRadians(lat1)), Cos(ToRadians(lat2))),
        sq(Sin(dLon))))
    val dist = Multiply(Literal(2 * 6371.0), Asin(Sqrt(a)))
    And(band, LessThanOrEqual(dist, r))
  }

  /** Register as a SQL function (`WHERE st_dwithin(lat, lon, 40, -75, 3000)`). */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "st_dwithin", build)
}
