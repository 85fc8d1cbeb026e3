package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Keep-latest dedup (W1), conditional upsert merge (M1) and the
  * denormalized fact-table build (SURVEY.md §2.5, §2.6; reference
  * queries.py:120-161, queries.py:133/150).
  *
  * The reference's `INSERT … ON CONFLICT DO UPDATE WHERE older` is
  * reproduced relationally: union existing + incoming, then keep exactly one
  * row per PK — highest `modified_dt` wins, with a FULL deterministic
  * tiebreak (PG's `DISTINCT ON` breaks ties arbitrarily; we pin event_id
  * DESC so results are stable and oracle-comparable).
  *
  * Scale: the window dedup shuffles by PK once — the same exchange a
  * `MERGE INTO` shuffle-join would need. Older incoming rows lose the
  * window race, which is exactly the conditional-update predicate.
  */
object Merge {

  /** One row per key, ordered winner first. `ordering` must be total
    * (include a unique tiebreak) for deterministic results. */
  def keepLatest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD-1 conditional upsert: insert new keys, overwrite existing keys only
    * when the incoming row is newer (reference queries.py:120-161). */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
      ordering: Seq[Column]): DataFrame =
    keepLatest(existing.unionByName(incoming), keys, ordering)

  private val eventOrdering = Seq(col("ts").desc, col("event_id").desc)
  private val eventKeys = Seq("user_id", "event_type")

  val entries: Seq[QueryDef] = Seq(

    // W1 keep-latest-per-key dedup (reference: queries.py:133,150).
    QueryDef("q13_keep_latest",
      """SELECT user_id, event_type, event_id, round(1e-9 + value, 4) AS value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      keepLatest(Tables.events(s, d), eventKeys, eventOrdering)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Num.roundOut(col("value"), 4).as("value"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // M1 conditional upsert: an existing deduped snapshot merged with a raw
    // overlapping incoming slice; newer rows win, older incoming rows lose
    // the window race (reference: queries.py:120-161, etl.py:317-327).
    QueryDef("q14_upsert_merge",
      """WITH existing AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15')
        |  WHERE rn = 1
        |), incoming AS (
        |  SELECT * FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-10'
        |), unioned AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM existing
        |  UNION ALL
        |  SELECT event_id, ts, user_id, event_type, value FROM incoming
        |)
        |SELECT user_id, event_type, event_id AS latest_event_id,
        |       CAST(ts AS DATE) AS day, round(1e-9 + value, 4) AS value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn2
        |      FROM unioned)
        |WHERE rn2 = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      val existing = keepLatest(
        e.filter(to_date(col("ts")) <= "2024-01-15"), eventKeys, eventOrdering)
      val incoming = e.filter(to_date(col("ts")) >= "2024-01-10")
      upsert(existing, incoming, eventKeys, eventOrdering)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("latest_event_id"),
          to_date(col("ts")).as("day"),
          Num.roundOut(col("value"), 4).as("value"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // The denormalized fact-table build: dedup + containment-bucket join +
    // daily join + JSON attribute — `accident_facts` analog
    // (reference: queries.py:94-161). Facts-preserving left joins with both
    // small sides broadcast: no fact shuffle beyond the dedup exchange.
    QueryDef("q22_fact_build",
      """WITH dedup AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |  WHERE rn = 1
        |), buckets AS (
        |  SELECT CAST(range AS INT) AS lo, CAST(range + 50 AS INT) AS hi
        |  FROM range(0, 500, 50)
        |), daily AS (
        |  SELECT CAST(ts AS DATE) AS day, round(1e-9 + avg(value), 4) AS day_avg
        |  FROM events GROUP BY 1
        |)
        |SELECT de.user_id, de.event_type, de.event_id,
        |       CAST(de.ts AS DATE) AS day, b.lo, b.hi,
        |       CAST(json_extract_string(de.props, '$.k') AS INT) AS k,
        |       round(1e-9 + de.value, 4) AS value, dy.day_avg
        |FROM dedup de
        |LEFT JOIN buckets b ON de.value >= b.lo AND de.value < b.hi
        |LEFT JOIN daily dy ON CAST(de.ts AS DATE) = dy.day
        |ORDER BY de.user_id, de.event_type""".stripMargin) { (s, d) =>
      // the SAME plan q25_fact_serving persists — this oracle-checked query
      // is what validates the matview build (single source of truth)
      FactBuild.build(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("day"), col("lo"), col("hi"), col("k"),
          Num.roundOut(col("value"), 4).as("value"), col("day_avg"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // Snapshot DIFF (change-data-capture): classify every key as
    // insert / update / delete between two keep-latest states — here two
    // sliding event windows (days 1-20 vs 11-30), so all three change
    // kinds occur with append-only input. An update is a key whose WINNING
    // row changed (event_id differs), not whose value happens to differ.
    // Scale shape: each snapshot is one PK-shuffle window dedup (in a real
    // deployment they'd be stored state tables, zero recompute) and the
    // diff is one co-partitioned full outer join on the same PK — three
    // exchanges total on the same key, which AQE coalesces; nothing is
    // broadcast, nothing is collected.
    QueryDef("q54_snapshot_diff",
      """WITH a AS (
        |  SELECT user_id, event_type, event_id, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-20')
        |  WHERE rn = 1
        |), b AS (
        |  SELECT user_id, event_type, event_id, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-11')
        |  WHERE rn = 1
        |)
        |SELECT coalesce(a.user_id, b.user_id) AS user_id,
        |       coalesce(a.event_type, b.event_type) AS event_type,
        |       CASE WHEN a.user_id IS NULL THEN 'insert'
        |            WHEN b.user_id IS NULL THEN 'delete'
        |            ELSE 'update' END AS change,
        |       a.event_id AS old_event_id, b.event_id AS new_event_id,
        |       round(1e-9 + a.value, 4) AS old_value,
        |       round(1e-9 + b.value, 4) AS new_value
        |FROM a FULL JOIN b
        |  ON a.user_id = b.user_id AND a.event_type = b.event_type
        |WHERE a.user_id IS NULL OR b.user_id IS NULL
        |   OR a.event_id <> b.event_id
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      def snap(f: DataFrame => DataFrame): DataFrame =
        keepLatest(f(e), eventKeys, eventOrdering)
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("value"))
      val a = snap(_.filter(to_date(col("ts")) <= "2024-01-20")).as("a")
      val b = snap(_.filter(to_date(col("ts")) >= "2024-01-11")).as("b")
      a.join(b,
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") === col("b.event_type"), "full_outer")
        .filter(col("a.user_id").isNull || col("b.user_id").isNull ||
          col("a.event_id") =!= col("b.event_id"))
        .select(
          coalesce(col("a.user_id"), col("b.user_id")).as("user_id"),
          coalesce(col("a.event_type"), col("b.event_type")).as("event_type"),
          when(col("a.user_id").isNull, "insert")
            .when(col("b.user_id").isNull, "delete")
            .otherwise("update").as("change"),
          col("a.event_id").as("old_event_id"),
          col("b.event_id").as("new_event_id"),
          Num.roundOut(col("a.value"), 4).as("old_value"),
          Num.roundOut(col("b.value"), 4).as("new_value"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // SCD TYPE-2 HISTORY RECONSTRUCTION — the other half of the SCD
    // story (M1/x14 is Type-1 "overwrite"): rebuild the full
    // validity-interval dimension from the raw event stream. Gaps-and-
    // islands collapses each user's consecutive same-status events into
    // one run (lag + running change count), then each run becomes an
    // SCD2 row: [valid_from, valid_to) with NULL valid_to + is_current=1
    // on the open run — the standard warehouse dimension shape
    // (Kimball). Deterministic total order: (ts, event_id).
    //
    // Scale: every window partitions by user_id — the event table's
    // natural high-cardinality key, one shuffle total since all three
    // windows share the partitioning; no global sort; output rows =
    // status runs.
    QueryDef("x191_scd2_history", Merge.x191OracleSql) { (s, d) =>
      Merge.scd2Runs(Tables.events(s, d))
        .orderBy(col("user_id"), col("run_id"))
    },

    // SCD2 POINT-IN-TIME (AS-OF) ENRICHMENT — the consumer x191's
    // dimension exists FOR: enrich each purchase event with the status
    // run valid at its timestamp. The dimension is the SCD2 history
    // over the user's NON-purchase activity (so dimension and probe are
    // genuinely distinct streams); the as-of semantics are the standard
    // [valid_from, next valid_from) interval with valid_from == ts
    // counting as valid (dim-before-probe tiebreak). A purchase before
    // the user's first non-purchase run carries the DESIGNED NULL —
    // there is no dimension version to attribute it to.
    //
    // Scale: the J5/q12 as-of pattern — dimension markers and probes
    // UNION into one user-partitioned carry-forward window (a single
    // user-keyed shuffle; the event table's natural key), never a
    // ts-range nested-loop join (PlanShapeSpec bans BNLJ/cartesian).
    // The within-(user, ts, kind) tiebreak key `sk` (run_id for
    // markers, event_id for probes) makes the carry-forward order TOTAL
    // and null-free on both engines — simultaneous-timestamp runs
    // resolve to the later run deterministically.
    QueryDef("x195_scd2_pointintime",
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(event_type) OVER w
        |                   IS DISTINCT FROM event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM events WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), r AS (
        |  SELECT user_id, ts, event_type,
        |         CAST(sum(chg) OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS BIGINT)
        |           AS run_id
        |  FROM e
        |), runs AS (
        |  SELECT user_id, run_id, min(event_type) AS status,
        |         min(ts) AS valid_from
        |  FROM r GROUP BY 1, 2
        |), m AS (
        |  SELECT user_id, valid_from AS ts, 0 AS kind, run_id AS sk,
        |         run_id AS d_run, status AS d_status,
        |         CAST(NULL AS BIGINT) AS event_id
        |  FROM runs
        |  UNION ALL
        |  SELECT user_id, ts, 1, event_id, CAST(NULL AS BIGINT),
        |         CAST(NULL AS VARCHAR), event_id
        |  FROM events WHERE event_type = 'purchase'
        |), f AS (
        |  SELECT user_id, kind, event_id,
        |         last_value(d_run IGNORE NULLS) OVER w AS run_id,
        |         last_value(d_status IGNORE NULLS) OVER w AS status
        |  FROM m
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, sk
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, run_id, status
        |FROM f WHERE kind = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val dim = Merge.scd2RawRuns(ev.filter(col("event_type") =!= "purchase"))
        .select(col("user_id"), col("valid_from").as("ts"),
          lit(0).as("kind"), col("run_id").as("sk"),
          col("run_id").as("d_run"), col("status").as("d_status"),
          lit(null).cast("long").as("event_id"))
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id").as("sk"), lit(null).cast("long").as("d_run"),
          lit(null).cast("string").as("d_status"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("sk"))
        .rowsBetween(Window.unboundedPreceding, 0)
      dim.unionByName(probe)
        .withColumn("run_id", last(col("d_run"), ignoreNulls = true).over(w))
        .withColumn("status",
          last(col("d_status"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("run_id"),
          col("status"))
        .orderBy(col("event_id"))
    }
  )

  /** x191's oracle — shared with st29's streaming SCD2 maintenance (the
    * x156↔st24 one-definition contract: stream state must answer the
    * batch oracle verbatim). */
  private[graft] lazy val x191OracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         CASE WHEN lag(event_type) OVER w
      |                   IS DISTINCT FROM event_type
      |              THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), r AS (
      |  SELECT user_id, ts, event_type,
      |         CAST(sum(chg) OVER (PARTITION BY user_id
      |                             ORDER BY ts, event_id) AS BIGINT)
      |           AS run_id
      |  FROM e
      |), runs AS (
      |  SELECT user_id, run_id, min(event_type) AS status,
      |         min(ts) AS valid_from, CAST(count(*) AS BIGINT)
      |           AS n_events
      |  FROM r GROUP BY 1, 2
      |)
      |SELECT user_id, run_id, status, valid_from,
      |       lead(valid_from) OVER w2 AS valid_to, n_events,
      |       CASE WHEN lead(valid_from) OVER w2 IS NULL
      |            THEN 1 ELSE 0 END AS is_current
      |FROM runs
      |WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
      |ORDER BY user_id, run_id""".stripMargin

  /** The RAW run table (no validity intervals yet) from an event slice —
    * gaps-and-islands: lag + running change count collapses consecutive
    * same-status events per user into runs keyed (user_id, run_id 1..k)
    * with (status, valid_from, n_events). Both windows share the
    * user_id partitioning — one shuffle. The change flag is null-safe
    * (`<=>` negation — IS DISTINCT FROM; ADVICE r10). Shared by x191,
    * x195's as-of consumer, and st29's per-batch fold. */
  private[graft] def scd2RawRuns(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = ev
      .withColumn("__prev", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg", when(!(col("__prev") <=> col("event_type")),
        1L).otherwise(0L))
    e.withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("status"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
  }

  /** The SCD2 finish over a raw run table: each run becomes
    * [valid_from, valid_to) with the open run flagged current — called
    * on x191's batch runs AND on st29's converged streaming state, so
    * the two can't diverge. */
  private[graft] def scd2Finish(runs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .select(col("user_id"), col("run_id"), col("status"),
        col("valid_from"), col("valid_to"), col("n_events"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** x191's SCD2 dimension from an event slice — raw runs + finish. */
  private[graft] def scd2Runs(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    scd2Finish(scd2RawRuns(ev))
}
