package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Round-2 relational breadth: pivot, cube grouping sets, ordinal unnest
  * (the posexplode UDTF surface), and the native `session_window` operator
  * (the declarative twin of streaming/Streams.sessionize and q34's manual
  * gaps-and-islands).
  *
  * Scale notes: pivot with an EXPLICIT value list avoids the eager
  * collect-distinct job and plans as two partial-agg exchanges; cube
  * expands each input row into its grouping-set combinations before one
  * shuffle; posexplode is pipelined (no shuffle); session_window is one
  * shuffle by user + an in-partition merge — same cost shape as q34.
  */
object Pivots {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val entries: Seq[QueryDef] = Seq(

    // PIVOT: per-user event-type count matrix. The explicit value list is
    // load-bearing at scale: without it Spark runs a separate eager
    // collect-distinct JOB over the fact table before it can even plan.
    // The plan itself is Spark's canonical two-phase pivot: partial agg by
    // (user, type), then pivot-agg by user — both exchanges carry only
    // per-key partials.
    QueryDef("q37_pivot",
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click')    AS click,
        |       count(*) FILTER (WHERE event_type = 'error')    AS error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |       count(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val p = Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      // pivot yields NULL for a (user, type) with no rows; the conditional
      // aggregate yields 0 — align on 0
      p.select(col("user_id") +:
          eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    },

    // CUBE over (day, event_type) with grouping indicators — extends q30's
    // rollup to the full grouping-set lattice.
    QueryDef("q38_cube",
      """SELECT day, event_type,
        |       CAST(GROUPING(day) AS INT) AS g_day,
        |       CAST(GROUPING(event_type) AS INT) AS g_type,
        |       count(*) AS n, round(1e-9 + sum(value), 4) AS sum_value
        |FROM (SELECT CAST(ts AS DATE) AS day, event_type, value FROM events)
        |GROUP BY CUBE(day, event_type)
        |ORDER BY g_day, g_type, day NULLS FIRST, event_type NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"), col("value"))
        .cube(col("day"), col("event_type"))
        .agg(grouping(col("day")).cast("int").as("g_day"),
          grouping(col("event_type")).cast("int").as("g_type"),
          count(lit(1)).as("n"),
          Num.roundOut(sum(col("value")), 4).as("sum_value"))
        .select(col("day"), col("event_type"), col("g_day"), col("g_type"),
          col("n"), col("sum_value"))
        .orderBy(col("g_day"), col("g_type"), col("day").asc_nulls_first,
          col("event_type").asc_nulls_first)
    },

    // Ordinal unnest — posexplode as the generator/UDTF surface (SURVEY.md
    // §2.10): one (doc, position, token) row per token, no shuffle.
    QueryDef("q39_posexplode",
      """SELECT doc_id, unnest(range(len(ws))) AS pos, unnest(ws) AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
        .orderBy(col("doc_id"), col("pos"))
    },

    // Native session_window aggregation (30-minute gap), checked against a
    // gaps-and-islands oracle. Session bounds are emitted as epoch MICROS
    // bigints (raw timestamps never cross the oracle compare — nanos
    // parity hazard). Boundary convention: Spark merges an event that
    // lands ON the previous window's end (gap INCLUSIVE — pinned by
    // StreamingSemanticsSpec), so the oracle's new-session test is
    // strictly `> INTERVAL 30 MINUTE`, same as q34.
    QueryDef("q40_session_window",
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked
        |)
        |SELECT user_id,
        |       epoch_us(CAST(min(ts) AS TIMESTAMP)) AS session_start,
        |       epoch_us(CAST(max(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE) AS session_end,
        |       count(*) AS n, round(1e-9 + sum(value), 4) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          Num.roundOut(sum(col("value")), 4).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start"),
          unix_micros(col("w.end")).as("session_end"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Collection-type surface: JSON → MapType (keys/values/element access)
    // and array functions (sequence, contains, position) — all pipelined
    // per-row expressions, scalar outputs only (arrays/maps never cross
    // the oracle compare). Both engines return 0 for array_position /
    // list_position when the element is absent.
    QueryDef("q44_collections",
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INT) AS k_val,
        |       CAST(len(json_keys(props)) AS INT) AS n_keys,
        |       array_to_string(json_keys(props), ',') AS keys_str,
        |       CAST(list_contains(range(1, CAST(event_id % 5 AS INT) + 2), 3) AS INT) AS has3,
        |       CAST(list_position(range(1, CAST(event_id % 5 AS INT) + 2), 3) AS INT) AS pos3
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val kv = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType))
      val arr = sequence(lit(1), (col("event_id") % 5).cast("int") + 1)
      Tables.events(s, d).select(col("event_id"),
          element_at(kv, "k").as("k_val"),
          size(map_keys(kv)).as("n_keys"),
          concat_ws(",", map_keys(kv)).as("keys_str"),
          array_contains(arr, 3).cast("int").as("has3"),
          array_position(arr, 3).cast("int").as("pos3"))
        .orderBy(col("event_id"))
    },

    // Spark 4 VARIANT — the semi-structured type: parse once into a binary
    // variant, extract typed scalars with variant_get paths. At scale this
    // replaces per-access get_json_object re-parsing (q17) with one parse
    // + cheap typed reads; extracted scalars compare directly against the
    // oracle's JSON functions.
    QueryDef("q51_variant",
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INT) AS k_int,
        |       CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
        |       CAST(json_extract(props, '$.missing') AS INT) AS absent,
        |       CAST(json_extract_string(props, '$.k') IS NOT NULL AS INT) AS has_k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val v = parse_json(col("props"))
      Tables.events(s, d).select(col("event_id"),
          variant_get(v, "$.k", "int").as("k_int"),
          variant_get(v, "$.k", "double").as("k_dbl"),
          variant_get(v, "$.missing", "int").as("absent"),
          variant_get(v, "$.k", "string").isNotNull.cast("int").as("has_k"))
        .orderBy(col("event_id"))
    },

    // UNPIVOT — the inverse of q37: per-user type counts melt back to
    // (user_id, event_type, n) long form. Generator-style row expansion,
    // no shuffle beyond the pivot aggregate it consumes.
    QueryDef("q45_unpivot",
      """WITH wide AS (
        |  SELECT user_id,
        |         count(*) FILTER (WHERE event_type = 'click')    AS click,
        |         count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |         count(*) FILTER (WHERE event_type = 'view')     AS view
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id, event_type, n FROM (
        |  SELECT user_id, 'click' AS event_type, click AS n FROM wide
        |  UNION ALL SELECT user_id, 'purchase', purchase FROM wide
        |  UNION ALL SELECT user_id, 'view', view FROM wide
        |)
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val types = Seq("click", "purchase", "view")
      val wide = Tables.events(s, d)
        .groupBy(col("user_id")).pivot("event_type", types).agg(count(lit(1)))
      val filled = wide.select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      filled.unpivot(Array(col("user_id")),
          types.map(col).toArray, "event_type", "n")
        .orderBy(col("user_id"), col("event_type"))
    },

    // Explicit GROUPING SETS (the lattice members rollup/cube can't
    // express individually) — through the SQL front door, same statement
    // text in both engines over the `events` view/table.
    QueryDef("q46_grouping_sets", Pivots.groupingSetsSql) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(Pivots.groupingSetsSql)
    },

    // Statistical window functions: percent_rank / cume_dist / nth_value —
    // exact rationals of ranks (identical doubles in both engines under a
    // total deterministic order).
    QueryDef("q47_window_stats",
      """SELECT event_id, user_id,
        |       round(1e-9 + percent_rank() OVER w, 6) AS pct_rank,
        |       round(1e-9 + cume_dist() OVER w, 6) AS cume,
        |       nth_value(event_id, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("user_id"),
          Num.roundOut(percent_rank().over(w), 6).as("pct_rank"),
          Num.roundOut(cume_dist().over(w), 6).as("cume"),
          nth_value(col("event_id"), 3).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("third_event"))
        .orderBy(col("event_id"))
    }
  )

  /** Shared Spark/DuckDB statement for q46 (a def: `entries` initializes
    * first and would capture a null val). */
  private def groupingSetsSql: String =
    """SELECT day, event_type,
      |       CAST(GROUPING(day) AS INT) AS g_day,
      |       CAST(GROUPING(event_type) AS INT) AS g_type,
      |       count(*) AS n
      |FROM (SELECT CAST(ts AS DATE) AS day, event_type FROM events) t
      |GROUP BY GROUPING SETS ((day), (event_type), ())
      |ORDER BY g_day, g_type, day NULLS FIRST, event_type NULLS FIRST""".stripMargin
}
