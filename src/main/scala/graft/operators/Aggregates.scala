package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Aggregate / sort / limit battery — reference operators A1-A9, O1-O5,
  * F11 (SURVEY.md §2.4, §2.7).
  *
  * All aggregates are Spark built-ins → hash aggregate with map-side
  * partials; only per-group partials cross the exchange. Float aggregates
  * are rounded (4 dp) in BOTH engines to mask summation-order drift.
  * `median` is Spark's exact median (3.4+), matching DuckDB's interpolating
  * median on doubles.
  */
object Aggregates {

  val entries: Seq[QueryDef] = Seq(

    // A2/A5/A6/A7 per-group stats incl. median (reference: viz.py:228-229,
    // 314-316, queries.py:81-91).
    QueryDef("q15_agg_battery",
      """SELECT event_type, count(*) AS n,
        |       round(1e-9 + avg(value), 4) AS avg_value,
        |       round(1e-9 + median(value), 4) AS med_value,
        |       round(1e-9 + min(value), 4) AS min_value,
        |       round(1e-9 + max(value), 4) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Num.roundOut(avg(col("value")), 4).as("avg_value"),
          Num.roundOut(median(col("value")), 4).as("med_value"),
          Num.roundOut(min(col("value")), 4).as("min_value"),
          Num.roundOut(max(col("value")), 4).as("max_value"))
        .orderBy(col("event_type"))
    },

    // A4/A7 global scalar stats (reference: viz.py:314, etl.py:214-218,
    // viz.py:141-142).
    QueryDef("q16_global_stats",
      """SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        |       CAST(min(ts) AS DATE) AS first_day,
        |       CAST(max(ts) AS DATE) AS last_day
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        to_date(min(col("ts"))).as("first_day"),
        to_date(max(col("ts"))).as("last_day"))
    },

    // A8/F11 max-normalization color math (reference: viz.py:241-255).
    // The scalar max is cross-joined back (broadcast) — the normalization
    // constant never forces a second fact scan at scale. floor() pins
    // DuckDB-round vs Spark-truncate cast semantics.
    QueryDef("q21_color_math",
      """WITH cnts AS (
        |  SELECT user_id % 10 AS grp, count(*) AS cnt FROM events GROUP BY 1
        |), m AS (SELECT max(cnt) AS mx FROM cnts)
        |SELECT grp, cnt,
        |       CAST(floor(cnt * 255.0 / mx) AS INT) AS intensity,
        |       255 - CAST(floor(cnt * 255.0 / mx) AS INT) AS inverse
        |FROM cnts, m ORDER BY grp""".stripMargin) { (s, d) =>
      val cnts = Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("grp"))
        .agg(count(lit(1)).as("cnt"))
      val m = cnts.agg(max(col("cnt")).as("mx"))
      val intensity = floor(col("cnt") * 255.0 / col("mx")).cast("int")
      cnts.crossJoin(broadcast(m))
        .select(col("grp"), col("cnt"),
          intensity.as("intensity"),
          (lit(255) - intensity).as("inverse"))
        .orderBy(col("grp"))
    },

    // O1-O4 deterministic global top-k: orderBy+limit plans as
    // TakeOrderedAndProject — per-partition top-k then a single merge, no
    // global sort of the fact table.
    QueryDef("q24_topk",
      """SELECT event_id, round(1e-9 + value, 4) AS value_r FROM (
        |  SELECT event_id, value FROM events
        |  ORDER BY value DESC, event_id LIMIT 100
        |) ORDER BY value DESC, event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("value"))
        .orderBy(col("value").desc, col("event_id"))
        .limit(100)
        .select(col("event_id"), Num.roundOut(col("value"), 4).as("value_r"))
    },

    // String aggregation (listagg): sorted-distinct list per key — order
    // pinned on both sides so the concatenation is deterministic.
    QueryDef("q48_string_agg",
      """SELECT user_id,
        |       array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
        |       CAST(len(list_distinct(list(event_type))) AS INT) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"),
          size(collect_set(col("event_type"))).as("n_types"))
        .orderBy(col("user_id"))
    },

    // Statistical aggregates: stddev/variance/corr + min_by/max_by
    // (argmin/argmax). The min_by/max_by ORDERING key is the unique
    // event_id — a value-keyed argmin would be tie-nondeterministic.
    QueryDef("q49_stats_agg",
      """SELECT event_type,
        |       round(1e-9 + stddev_samp(value), 4) AS sd,
        |       round(1e-9 + var_samp(value), 4) AS var,
        |       round(1e-9 + corr(value, CAST(user_id AS DOUBLE)), 6) AS c,
        |       min_by(event_id, event_id) AS first_event,
        |       max_by(event_id, event_id) AS last_event
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(Num.roundOut(stddev_samp(col("value")), 4).as("sd"),
          Num.roundOut(var_samp(col("value")), 4).as("var"),
          Num.roundOut(corr(col("value"), col("user_id").cast("double")), 6).as("c"),
          min_by(col("event_id"), col("event_id")).as("first_event"),
          max_by(col("event_id"), col("event_id")).as("last_event"))
        .orderBy(col("event_type"))
    }
  )
}
