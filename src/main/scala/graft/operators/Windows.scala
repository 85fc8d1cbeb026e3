package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Window-function battery beyond the dedup in [[Merge]] — running
  * aggregates, lag, rank (SURVEY.md §2.5; capability breadth past the
  * reference's W1/W2).
  *
  * Running sums are computed in a fully deterministic frame order
  * (ts, event_id), so both engines add doubles in the same sequence —
  * bit-identical partials, no tolerance needed beyond the shared Num.roundOut(4).
  */
object Windows {

  val entries: Seq[QueryDef] = Seq(

    QueryDef("q23_window_battery",
      """SELECT event_id, user_id,
        |       row_number() OVER w AS rn,
        |       round(1e-9 + sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
        |       lag(event_id) OVER w AS prev_event_id,
        |       rank() OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)) AS day_rank
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDay = Window.partitionBy(col("user_id")).orderBy(to_date(col("ts")))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          row_number().over(w).as("rn"),
          Num.roundOut(sum(col("value")).over(wRun), 4).as("running_value"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          rank().over(wDay).as("day_rank"))
        .orderBy(col("event_id"))
    },

    // Time-RANGE window frames (the time-series rolling-aggregate shape
    // ROWS frames can't express): per user, events in the PRECEDING HOUR
    // — frame membership decided by the ordering VALUE (epoch micros),
    // not row position, so ts ties are frame peers on both engines.
    // Spark's rangeBetween takes the bound in ordering-column units
    // (micros here); the per-frame double sum is short and rounded (4dp,
    // nudged) like every cross-engine float aggregate. Scale: windowed
    // per user — one hash exchange, frames stream within each partition
    // ordered run (no per-row rescan).
    QueryDef("q61_time_range_frame",
      """SELECT event_id, user_id, ts_us,
        |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |       round(1e-9 + sum(value) OVER w, 4) AS sum_1h
        |FROM (SELECT event_id, user_id, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("ts_us"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_1h"),
          Num.roundOut(sum(col("value")).over(w), 4).as("sum_1h"))
        .orderBy(col("event_id"))
    },

    // COUNT(DISTINCT) OVER — the window frame ANSI engines (Spark
    // included) refuse to plan. The scalable idiom: flag each row that is
    // the FIRST occurrence of its (user, event_type) via row_number, then
    // running-sum the flags per user. Two window exchanges on the same
    // user-keyed hash partitioning (Catalyst reuses the exchange), O(1)
    // state per row — vs the collect_set-over-frame alternative whose
    // per-frame set is O(distinct) memory and non-codegen. That's the
    // difference between surviving 100 TB and not.
    QueryDef("q64_running_distinct",
      """WITH f AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         CASE WHEN row_number() OVER (
        |                PARTITION BY user_id, event_type
        |                ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) = 1
        |              THEN 1 ELSE 0 END AS first_seen
        |  FROM events
        |)
        |SELECT user_id, event_id, ts_us,
        |       CAST(sum(first_seen) OVER (PARTITION BY user_id
        |         ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |         AS n_distinct_types
        |FROM f ORDER BY user_id, ts_us, event_id""".stripMargin) { (s, d) =>
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        // one explicit user-keyed exchange serves BOTH windows:
        // HashPartitioning(user) satisfies Clustered(user, event_type) (a
        // subset clusters any superset), whereas planning bottom-up would
        // shuffle on (user, event_type) first and then AGAIN on user.
        .repartition(col("user_id"))
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          sum(col("first_seen")).over(wRun).as("n_distinct_types"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },

    // NATIVE top-k-per-group — the custom whole-operator tier
    // ([[graft.plans.TopKPerGroup]]: logical node + injected Strategy +
    // two-phase SparkPlan with bounded per-group heaps). The declarative
    // row_number form sorts EVERY group member to keep 3; the operator's
    // partial phase reduces each input partition to ≤ k rows per group
    // BEFORE the exchange, the final phase merges heaps after it — the
    // partial/final aggregation contract applied to a rank filter, and
    // the per-group analogue of TakeOrderedAndProject. The oracle runs
    // the ANSI row_number form; hash equality IS the operator's
    // correctness proof (ties are impossible: (value, event_id) is a
    // total order). TopKSpec additionally pins the plan shape (two exec
    // nodes, one exchange, no sort) and the window-form equivalence.
    QueryDef("q88_native_topk",
      """SELECT event_type, event_id, round(1e-9 + value, 4) AS value
        |FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL)
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
        .filter(col("value").isNotNull)
      graft.plans.TopKPerGroup(ev, Seq("event_type"),
          Seq("value" -> true, "event_id" -> false), 3)
        .select(col("event_type"), col("event_id"),
          Num.roundOut(col("value"), 4).as("value"))
        .orderBy(col("event_type"), col("value").desc, col("event_id"))
    },

    // Distribution-rank completion: percent_rank ((rank−1)/(n−1)) and
    // cume_dist (rows ≤ current / n) — the two ANSI rank functions the
    // q23/q28 batteries don't cover; both are rational functions of
    // integer rank/count, so cross-engine parity is exact. The empirical-
    // CDF transform behind quantile normalization of a feature column.
    QueryDef("q89_rank_functions",
      """SELECT event_id, event_type,
        |       round(1e-9 + percent_rank() OVER w, 6) AS pr,
        |       round(1e-9 + cume_dist() OVER w, 6) AS cd,
        |       ntile(10) OVER w AS decile
        |FROM events WHERE value IS NOT NULL
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          Num.roundOut(percent_rank().over(w), 6).as("pr"),
          Num.roundOut(cume_dist().over(w), 6).as("cd"),
          ntile(10).over(w).as("decile"))
        .orderBy(col("event_id"))
    }
  )
}
