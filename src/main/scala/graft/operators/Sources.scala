package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Geo
import graft.{QueryDef, Tables}

/** Source-shape operators: the reference's REST/GeoJSON ingestion path
  * (SURVEY.md §2.1 S2/S3 + F1: FeatureCollection unwrap → explode features
  * → hoist `properties.*` → geometry → WKT; etl.py:62-159) re-expressed as
  * a deterministic JSON→relational pipeline.
  *
  * A per-region FeatureCollection payload is synthesized from `nation`
  * identically in both engines (string concat + lexically-sorted
  * aggregation), then parsed with from_json and EXPLODED — the exact shape
  * `spark.read.json` yields on a fetched FeatureCollection, so the unwrap
  * logic is the real thing. Scale: JSON parsing is per-row codegen'd
  * (`JsonToStructs`); the explode is pipelined, no shuffle.
  */
object Sources {

  private val fcSchema = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", StructType(Seq(
        StructField("name", StringType),
        StructField("key", LongType)))),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(DoubleType)))))))))))

  val entries: Seq[QueryDef] = Seq(

    QueryDef("q26_geojson_unwrap",
      """WITH feature AS (
        |  SELECT n_regionkey,
        |         '{"type":"Feature","properties":{"name":"' || n_name ||
        |         '","key":' || n_nationkey ||
        |         '},"geometry":{"type":"Point","coordinates":[' ||
        |         n_nationkey || '.0,' || n_regionkey || '.0]}}' AS fj
        |  FROM nation
        |), fc AS (
        |  SELECT n_regionkey,
        |         '{"type":"FeatureCollection","features":[' ||
        |         string_agg(fj, ',' ORDER BY fj) || ']}' AS payload
        |  FROM feature GROUP BY n_regionkey
        |), exploded AS (
        |  SELECT unnest(CAST(json_extract(payload, '$.features[*]') AS JSON[])) AS f
        |  FROM fc
        |)
        |SELECT json_extract_string(f, '$.properties.name') AS name,
        |       CAST(json_extract_string(f, '$.properties.key') AS BIGINT) AS key,
        |       concat('POINT(',
        |         CAST(CAST(json_extract(f, '$.geometry.coordinates[0]') AS DOUBLE) AS VARCHAR),
        |         ' ',
        |         CAST(CAST(json_extract(f, '$.geometry.coordinates[1]') AS DOUBLE) AS VARCHAR),
        |         ')') AS wkt
        |FROM exploded ORDER BY key""".stripMargin) { (s, d) =>
      // synthesize the same per-region FeatureCollection a REST GeoJSON
      // endpoint would deliver (lexically-sorted feature order, both engines)
      val feature = Tables.nation(s, d).select(col("n_regionkey"), concat(
        lit("""{"type":"Feature","properties":{"name":""""), col("n_name"),
        lit("""","key":"""), col("n_nationkey").cast("string"),
        lit("""},"geometry":{"type":"Point","coordinates":["""),
        col("n_nationkey").cast("string"), lit(".0,"),
        col("n_regionkey").cast("string"),
        lit(".0]}}")).as("fj"))
      val payload = feature.groupBy(col("n_regionkey"))
        .agg(concat(lit("""{"type":"FeatureCollection","features":["""),
          concat_ws(",", array_sort(collect_list(col("fj")))),
          lit("]}")).as("payload"))
      // the actual unwrap: parse → explode features → hoist → WKT.
      // The properties struct additionally takes a to_json→from_json
      // roundtrip (F3, reference etl.py:149-155's json.dumps of nested
      // values) — identity on the data, so the oracle is unaffected, but
      // the serialization path is exercised under the hash check.
      val propSchema = fcSchema("features").dataType
        .asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType]("properties").dataType
      payload
        .withColumn("fc", from_json(col("payload"), fcSchema))
        .select(explode(col("fc.features")).as("f"))
        .withColumn("props_json", to_json(col("f.properties")))
        .withColumn("p2", from_json(col("props_json"), propSchema))
        .select(
          col("p2.name").as("name"),
          col("p2.key").as("key"),
          Geo.formatPointWkt(
            element_at(col("f.geometry.coordinates"), 1),
            element_at(col("f.geometry.coordinates"), 2)).as("wkt"))
        .orderBy(col("key"))
    }
  )
}
