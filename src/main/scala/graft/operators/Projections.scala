package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Projection / filter / scalar battery — reference operators P1-P11 +
  * F3/F4/F10 (SURVEY.md §2.2, §2.8).
  *
  * All predicates and projections are plain `Column` expressions, so
  * Catalyst pushes them into the parquet scan (PushedFilters / ReadSchema) —
  * at 100 TB these queries read only the referenced columns and skip
  * row groups via parquet min/max stats, the analog of the reference's
  * B-tree index pruning (etl.py:239-247).
  */
object Projections {

  val entries: Seq[QueryDef] = Seq(

    // P1/P2 bulk rename + projection over a grouped daily profile — the
    // `weather` table build analog (reference: etl.py:96-102).
    QueryDef("q02_daily_profile",
      """SELECT CAST(ts AS DATE) AS wx_date, count(*) AS n_obs,
        |       round(1e-9 + avg(value), 4) AS avg_value,
        |       round(1e-9 + min(value), 4) AS min_value,
        |       round(1e-9 + max(value), 4) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("wx_date"))
        .agg(
          count(lit(1)).as("n_obs"),
          Num.roundOut(avg(col("value")), 4).as("avg_value"),
          Num.roundOut(min(col("value")), 4).as("min_value"),
          Num.roundOut(max(col("value")), 4).as("max_value"))
        .orderBy(col("wx_date"))
    },

    // P4/F10 casts + date_trunc (reference: queries.py:134-135, viz.py:79).
    // DuckDB CAST(double AS INT) rounds while Spark truncates — floor() on
    // both sides pins the semantics.
    QueryDef("q03_cast_trunc",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_shipdate AS DATE) AS ship_date,
        |       CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
        |       CAST(floor(l_quantity) AS INT) AS qty_int
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_date"),
        trunc(col("l_shipdate"), "month").as("ship_month"),
        floor(col("l_quantity")).cast("int").as("qty_int"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // P5 not-null + P6 date-range + P8 numeric-between + P9 threshold
    // (reference: viz.py:200-214, queries.py:149).
    QueryDef("q04_filter_battery",
      """SELECT event_id, user_id, event_type, round(1e-9 + value, 4) AS value
        |FROM events
        |WHERE props IS NOT NULL
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-20'
        |  AND value BETWEEN 10 AND 200
        |  AND value > 0
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("props").isNotNull)
        .filter(to_date(col("ts")).between("2024-01-05", "2024-01-20"))
        .filter(col("value").between(10, 200))
        .filter(col("value") > 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          Num.roundOut(col("value"), 4).as("value"))
        .orderBy(col("event_id"))
    },

    // P7 membership predicate (reference: viz.py:205-206).
    QueryDef("q05_isin",
      """SELECT event_id, event_type, round(1e-9 + value, 4) AS value
        |FROM events WHERE event_type IN ('click', 'purchase')
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("event_type"),
          Num.roundOut(col("value"), 4).as("value"))
        .orderBy(col("event_id"))
    },

    // P10/A9/O5 null-drop + distinct + sort — dimension dropdown values
    // (reference: viz.py:152).
    QueryDef("q06_distinct_sorted",
      """SELECT DISTINCT event_type FROM events
        |WHERE event_type IS NOT NULL ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type")).na.drop()
        .distinct()
        .orderBy(col("event_type"))
    },

    // P11 null replacement after a dimension-preserving count join
    // (reference: viz.py:237-238). Facts pre-aggregated by key (map-side
    // partials, tiny exchange) then joined to the dimension — the scalable
    // shape for a 100 TB fact side.
    QueryDef("q07_fillna_counts",
      """SELECT n.n_name AS nation_name, COALESCE(f.cnt, 0) AS n_customers
        |FROM nation n
        |LEFT JOIN (SELECT c_nationkey, count(*) AS cnt
        |           FROM customer GROUP BY 1) f
        |  ON n.n_nationkey = f.c_nationkey
        |ORDER BY nation_name""".stripMargin) { (s, d) =>
      val perKey = Tables.customer(s, d)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
      Tables.nation(s, d)
        .join(broadcast(perKey), col("n_nationkey") === col("c_nationkey"), "left")
        .select(col("n_name").as("nation_name"),
          coalesce(col("cnt"), lit(0L)).as("n_customers"))
        .orderBy(col("nation_name"))
    },

    // F3/F4 JSON field access on events.props (reference: etl.py:149-155,
    // 72-74) — get_json_object is codegen'd, no UDF.
    QueryDef("q17_json_extract",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
    }
  )
}
