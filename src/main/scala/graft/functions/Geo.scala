package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions — the PostGIS surface the reference leans on
  * (SURVEY.md §2.8): WKT format/parse (F1/F2/F5, reference etl.py:108-130,
  * etl.py:194), point-in-polygon containment (F6, `ST_Contains`
  * queries.py:59), coordinate extraction (F7, `ST_X`/`ST_Y`
  * queries.py:140-141), point construction (F9) and haversine distance
  * (F8, `ST_DWithin` queries.py:182-186).
  *
  * Everything except the ray-casting loop is built from
  * `org.apache.spark.sql.functions` — codegen'd, whole-stage-compatible, no
  * UDF in the hot path. The ray cast needs per-vertex iteration with state,
  * so it is a Scala UDF on the broadcast (tiny) polygon side only.
  */
object Geo {

  /** F9: `ST_SetSRID(ST_MakePoint(lon,lat),4326)` analog — point as struct. */
  def makePoint(x: Column, y: Column): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"))

  /** F7: ST_X / ST_Y — struct field access. */
  def stX(pt: Column): Column = pt.getField("x")
  def stY(pt: Column): Column = pt.getField("y")

  /** F1: `[lon,lat]` → `"POINT(lon lat)"` (reference etl.py:115-117).
    * Pure string concat — codegen'd. */
  def formatPointWkt(x: Column, y: Column): Column =
    concat(lit("POINT("), x.cast("string"), lit(" "), y.cast("string"), lit(")"))

  /** Inverse of [[formatPointWkt]]: WKT point text → struct(x,y) (F5). */
  def parsePointWkt(wkt: Column): Column = {
    val inner = regexp_extract(wkt, "POINT\\(([^)]+)\\)", 1)
    val parts = split(inner, " ")
    makePoint(element_at(parts, 1).cast("double"),
      element_at(parts, 2).cast("double"))
  }

  /** F2: single-ring polygon coords array<struct<x,y>> → WKT
    * `"POLYGON((x y, x y, …))"` (reference etl.py:119-128). Built with
    * `transform` + `concat_ws` — native higher-order functions, no UDF. */
  def formatPolygonWkt(coords: Column): Column =
    concat(lit("POLYGON(("),
      concat_ws(", ",
        transform(coords, p =>
          concat(p.getField("x").cast("string"), lit(" "),
            p.getField("y").cast("string")))),
      lit("))"))

  /** F5: WKT single-ring polygon text → array<struct<x,y>>. */
  def parsePolygonWkt(wkt: Column): Column = {
    val inner = regexp_extract(wkt, "POLYGON\\(\\(([^)]+)\\)\\)", 1)
    transform(split(inner, ",\\s*"), s => {
      val p = split(trim(s), "\\s+")
      makePoint(element_at(p, 1).cast("double"), element_at(p, 2).cast("double"))
    })
  }

  private def formatRing(ring: Column): Column =
    concat(lit("("),
      concat_ws(", ",
        transform(ring, p =>
          concat(p.getField("x").cast("string"), lit(" "),
            p.getField("y").cast("string")))),
      lit(")"))

  /** F2 (holes): polygon with rings `array<array<struct<x,y>>>` (first =
    * outer, rest = holes) → WKT `"POLYGON((outer), (hole), …)"`. Native
    * nested higher-order functions, no UDF. */
  def formatPolygonWktRings(rings: Column): Column =
    concat(lit("POLYGON("),
      concat_ws(", ", transform(rings, formatRing(_))), lit(")"))

  /** F2 (full): `array<array<array<struct<x,y>>>>` (polygons → rings →
    * points) → WKT `"MULTIPOLYGON(((…)), ((…), (…)))"` — the complete
    * shape the reference's geojson_to_wkt emits (etl.py:119-128). */
  def formatMultiPolygonWkt(polys: Column): Column =
    concat(lit("MULTIPOLYGON("),
      concat_ws(", ", transform(polys, poly =>
        concat(lit("("), concat_ws(", ", transform(poly, formatRing(_))), lit(")")))),
      lit(")"))

  /** F5 (multi-ring): WKT POLYGON-with-holes or MULTIPOLYGON text →
    * flattened `array<array<struct<x,y>>>` of ALL rings. Each innermost
    * paren group is one ring; even-odd containment
    * ([[graft.plans.StContainsRings]]) needs no outer/hole or polygon
    * grouping, so the flat ring list is the probe-side representation. */
  def parseRingsWkt(wkt: Column): Column =
    transform(regexp_extract_all(wkt, lit("\\(([^()]+)\\)"), lit(1)), ring =>
      transform(split(ring, ",\\s*"), s => {
        val p = split(trim(s), "\\s+")
        makePoint(element_at(p, 1).cast("double"), element_at(p, 2).cast("double"))
      }))

  /** F6: ST_Contains(ring, point) via even-odd ray casting. Boundary
    * behavior is HALF-OPEN (a point exactly on the bottom/left edge counts
    * inside, top/right outside) — queries therefore pin data strictly away
    * from polygon edges (FIXTURES.md edge-case note). Scala UDF: the per-vertex
    * stateful loop doesn't decompose into higher-order built-ins; it runs
    * once per (point × broadcast polygon) probe, same cost shape as the
    * reference's GIST-probed `ST_Contains`. */
  val stContains = udf((ring: Seq[org.apache.spark.sql.Row], x: Double, y: Double) => {
    if (ring == null || ring.isEmpty) false
    else {
      var inside = false
      var j = ring.length - 1
      var i = 0
      while (i < ring.length) {
        val xi = ring(i).getDouble(0); val yi = ring(i).getDouble(1)
        val xj = ring(j).getDouble(0); val yj = ring(j).getDouble(1)
        if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
          inside = !inside
        j = i
        i += 1
      }
      inside
    }
  })

  /** F8: great-circle distance in km — pure column arithmetic (codegen'd).
    * `ST_DWithin(a, b, r)` ≙ `haversineKm(...) < r`. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val rLat1 = radians(lat1); val rLat2 = radians(lat2)
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) + cos(rLat1) * cos(rLat2) * sin(dLon) * sin(dLon)
    lit(2 * 6371.0) * asin(sqrt(a))
  }
}
