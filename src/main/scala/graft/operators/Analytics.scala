package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Product/event analytics over the `events` stream table — the funnel,
  * cohort-retention, and SCD-2 history shapes every warehouse serves —
  * plus triangle counting on the synthetic link graph (the multi-way
  * self-join silhouette).
  *
  * Scale: every query here keys its shuffles by user_id (the natural
  * high-cardinality partitioner for event data); per-user aggregates are
  * tiny relative to raw events, so the stage chain narrows monotonically
  * — raw events cross the wire at most once.
  */
object Analytics {

  /** q78's relational answer — shared VERBATIM with st13's streaming
    * cohort maintenance (the st10↔x39 / st11↔x42 move applied to
    * retention): one final answer definition, so the batch and streaming
    * paths can't drift apart. */
  private[graft] val q78OracleSql: String =
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
      |), a AS (
      |  SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS w
      |  FROM events e WHERE e.event_type = 'purchase'
      |), sz AS (
      |  SELECT cohort, count(*) AS n_cohort FROM f GROUP BY cohort
      |)
      |SELECT CAST(f.cohort AS DATE) AS cohort_week,
      |       CAST(datediff('day', f.cohort, a.w) // 7 AS BIGINT) AS offset_w,
      |       count(*) AS n_active, sz.n_cohort,
      |       round(1e-9 + count(*) * 1.0 / sz.n_cohort, 4) AS retention
      |FROM f JOIN a USING (user_id) JOIN sz ON f.cohort = sz.cohort
      |GROUP BY f.cohort, a.w, sz.n_cohort
      |ORDER BY cohort_week, offset_w""".stripMargin

  /** x109's relational answer — shared VERBATIM with st16's streaming
    * growth-accounting maintenance (the q78↔st13 contract applied to the
    * weekly ledger): one answer definition for both paths. */
  private[graft] val x109OracleSql: String =
    """WITH ua AS (
      |  SELECT DISTINCT user_id,
      |         CAST(date_trunc('week', ts) AS DATE) AS w
      |  FROM events
      |), st AS (
      |  SELECT user_id, w,
      |         lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw
      |  FROM ua
      |), lab AS (
      |  SELECT w, CASE WHEN pw IS NULL THEN 'new'
      |                 WHEN datediff('day', pw, w) = 7 THEN 'retained'
      |                 ELSE 'resurrected' END AS state
      |  FROM st
      |), led AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS n_active,
      |         CAST(count(*) FILTER (WHERE state = 'new') AS BIGINT)
      |           AS n_new,
      |         CAST(count(*) FILTER (WHERE state = 'retained') AS BIGINT)
      |           AS n_retained,
      |         CAST(count(*) FILTER (WHERE state = 'resurrected') AS BIGINT)
      |           AS n_resurrected
      |  FROM lab GROUP BY 1
      |)
      |SELECT w AS week, n_active, n_new, n_retained, n_resurrected,
      |       CAST(coalesce(lag(n_active) OVER (ORDER BY w), 0)
      |            - n_retained AS BIGINT) AS n_churned
      |FROM led ORDER BY week""".stripMargin

  /** x109's finish: the weekly ledger from a distinct (user_id, w) activity
    * table — called by the batch query and by st16 on its converged
    * streaming state, so the two can't diverge. */
  private[graft] def growthLedger(ua: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val lab = ua
      .withColumn("pw",
        lag(col("w"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("w"))))
      .withColumn("state", when(col("pw").isNull, "new")
        .when(datediff(col("w"), col("pw")) === 7, "retained")
        .otherwise("resurrected"))
    val led = lab.groupBy(col("w")).agg(
      count(lit(1)).as("n_active"),
      sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when(col("state") === "retained", 1L).otherwise(0L))
        .as("n_retained"),
      sum(when(col("state") === "resurrected", 1L).otherwise(0L))
        .as("n_resurrected"))
    led
      .withColumn("n_churned",
        coalesce(lag(col("n_active"), 1).over(Window.orderBy(col("w"))),
          lit(0L)) - col("n_retained"))
      .select(col("w").as("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"), col("n_churned"))
      .orderBy(col("week"))
  }

  /** x111's relational answer — shared VERBATIM with st17's streaming
    * A/B maintenance (the q78↔st13 contract applied to experiment
    * moments): one answer definition for both paths. */
  private[graft] val x111OracleSql: String =
    """WITH q AS (
      |  SELECT event_type, user_id % 2 AS arm,
      |         CAST(floor(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL
      |), g AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |         CAST(sum(CASE WHEN arm = 0 THEN v ELSE 0 END) AS BIGINT) AS sa,
      |         CAST(sum(CASE WHEN arm = 1 THEN v ELSE 0 END) AS BIGINT) AS sb,
      |         CAST(sum(CASE WHEN arm = 0 THEN v * v ELSE 0 END) AS BIGINT)
      |           AS qa,
      |         CAST(sum(CASE WHEN arm = 1 THEN v * v ELSE 0 END) AS BIGINT)
      |           AS qb
      |  FROM q GROUP BY event_type
      |), z AS (
      |  SELECT event_type, na, nb,
      |         sa * 1.0 / na AS ma, sb * 1.0 / nb AS mb,
      |         qa * 1.0 / na - (sa * 1.0 / na) * (sa * 1.0 / na) AS va,
      |         qb * 1.0 / nb - (sb * 1.0 / nb) * (sb * 1.0 / nb) AS vb
      |  FROM g
      |)
      |SELECT event_type, na AS n_control, nb AS n_treatment,
      |       round(1e-9 + ma / 1000.0, 6) AS mean_control,
      |       round(1e-9 + mb / 1000.0, 6) AS mean_treatment,
      |       round(1e-9 + (mb - ma) * 100.0 / ma, 4) AS lift_pct,
      |       round(1e-9 + (mb - ma) / sqrt(va / na + vb / nb), 4) AS z,
      |       abs((mb - ma) / sqrt(va / na + vb / nb)) > 1.96 AS significant
      |FROM z ORDER BY event_type""".stripMargin

  /** The per-event-type exact moment table (n/Σv/Σv² per arm) x111
    * aggregates and st17 maintains incrementally — every column is a
    * plain SUM, so partial tables from disjoint batches merge by
    * addition into exactly the full-scan table. */
  private[graft] def abMoments(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events
      .filter(col("value").isNotNull)
      .select(col("event_type"), (col("user_id") % 2).as("arm"),
        floor(col("value") * 1000).cast("long").as("v"))
      .groupBy(col("event_type")).agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 0, col("v")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === 1, col("v")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === 0, col("v") * col("v")).otherwise(0L)).as("qa"),
        sum(when(col("arm") === 1, col("v") * col("v")).otherwise(0L)).as("qb"))

  /** x111's finish from the moment table — called on the batch aggregate
    * and on st17's converged streaming state, so the two can't diverge. */
  private[graft] def abReadout(g: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val z = g.select(col("event_type"), col("na"), col("nb"),
      (col("sa") * 1.0 / col("na")).as("ma"),
      (col("sb") * 1.0 / col("nb")).as("mb"),
      (col("qa") * 1.0 / col("na")
        - (col("sa") * 1.0 / col("na")) * (col("sa") * 1.0 / col("na")))
        .as("va"),
      (col("qb") * 1.0 / col("nb")
        - (col("sb") * 1.0 / col("nb")) * (col("sb") * 1.0 / col("nb")))
        .as("vb"))
    val zExpr = (col("mb") - col("ma")) /
      sqrt(col("va") / col("na") + col("vb") / col("nb"))
    z.select(col("event_type"), col("na").as("n_control"),
        col("nb").as("n_treatment"),
        Num.roundOut(col("ma") / 1000.0, 6).as("mean_control"),
        Num.roundOut(col("mb") / 1000.0, 6).as("mean_treatment"),
        Num.roundOut((col("mb") - col("ma")) * 100.0 / col("ma"), 4)
          .as("lift_pct"),
        Num.roundOut(zExpr, 4).as("z"),
        (abs(zExpr) > 1.96).as("significant"))
      .orderBy(col("event_type"))
  }

  /** x119's relational answer — shared VERBATIM with st19's streaming
    * change-point maintenance (the q78↔st13 contract applied to drift
    * detection): one answer definition for both paths. */
  private[graft] val x119OracleSql: String =
    """WITH dcount AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1
      |), c AS (
      |  SELECT day, cnt,
      |         CAST(sum(cnt) OVER (ORDER BY day) AS BIGINT) AS cum,
      |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS d
      |  FROM dcount
      |), t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(cnt) AS BIGINT) AS tot
      |  FROM dcount
      |), g AS (
      |  SELECT day, cnt, cum, abs(n * cum - d * tot) AS g FROM c, t
      |)
      |SELECT day, cnt, cum, CAST(g AS BIGINT) AS g,
      |       g = max(g) OVER () AS is_peak
      |FROM g ORDER BY day""".stripMargin

  /** x119's finish from the daily-count table — called on the batch
    * aggregate and on st19's converged streaming state, so the two can't
    * diverge. Input: (day DATE, cnt LONG). */
  private[graft] def changepointReport(daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val t = daily.agg(count(lit(1)).as("n"), sum(col("cnt")).as("tot"))
    daily
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("d", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .crossJoin(broadcast(t))
      .withColumn("g", abs(col("n") * col("cum") - col("d") * col("tot")))
      .withColumn("is_peak", col("g") === max(col("g")).over(
        Window.partitionBy()))
      .select(col("day"), col("cnt"), col("cum"), col("g"), col("is_peak"))
      .orderBy(col("day"))
  }

  /** x125's relational answer — shared VERBATIM with st18's streaming
    * grouped top-k maintenance (the x111↔st17 contract applied to
    * leaderboards): one answer definition for both paths. Values fold in
    * MILLI-UNITS (`floor(value·1000)` per event, before any sum), so the
    * cross-batch state never holds a float and merge order cannot drift
    * the totals — st17's quantize-then-fold rule. */
  private[graft] val x125OracleSql: String =
    """WITH s AS (
      |  SELECT event_type, user_id, count(*) AS n_events,
      |         CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
      |           AS sv_milli
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY event_type, user_id
      |), r AS (
      |  SELECT event_type, user_id, n_events, sv_milli,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY sv_milli DESC, user_id) AS rnk
      |  FROM s
      |)
      |SELECT event_type, CAST(rnk AS INT) AS rnk, user_id, n_events,
      |       sv_milli
      |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin

  /** The per-(event_type, user) value ledger x125 ranks — counts and
    * milli-quantized sums only, so partials from disjoint micro-batches
    * ADD into exactly the full-scan table (st18 folds this per batch). */
  private[graft] def userValueState(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type"), col("user_id"),
        floor(col("value") * 1000).cast("long").as("v"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("sv_milli"))

  /** x125's finish from the ledger — called on the batch aggregate and on
    * st18's converged streaming state, so the two can't diverge. */
  private[graft] def valueTopK(state: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    state.withColumn("rnk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("sv_milli").desc, col("user_id"))).cast("int"))
      .filter(col("rnk") <= 3)
      .select(col("event_type"), col("rnk"), col("user_id"),
        col("n_events"), col("sv_milli"))
      .orderBy(col("event_type"), col("rnk"))

  /** x127's relational answer — shared VERBATIM with st20's streaming SRM
    * gate (the x119↔st19 contract applied to experiment validity). */
  private[graft] val x127OracleSql: String =
    """WITH a AS (
      |  SELECT DISTINCT event_type, user_id, user_id % 2 AS arm
      |  FROM events
      |), c AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_a,
      |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_b
      |  FROM a GROUP BY event_type
      |)
      |SELECT event_type, n_a, n_b,
      |       CAST(1000 * (n_a - n_b) * (n_a - n_b) // (n_a + n_b)
      |            AS BIGINT) AS chi2_milli,
      |       1000 * (n_a - n_b) * (n_a - n_b) // (n_a + n_b) >= 3841
      |         AS srm_flag
      |FROM c ORDER BY event_type""".stripMargin

  /** x127's finish from the distinct (event_type, user_id) activity set —
    * called on the batch distinct and on st20's converged streaming
    * state, so the two can't diverge. */
  private[graft] def srmReadout(distinctUsers: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    distinctUsers
      .select(col("event_type"), (col("user_id") % 2).as("arm"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("chi2_milli",
        expr("1000 * (n_a - n_b) * (n_a - n_b) div (n_a + n_b)"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("chi2_milli"),
        (col("chi2_milli") >= 3841).as("srm_flag"))
      .orderBy(col("event_type"))

  /** x182's integer activity set: DISTINCT (user, hour-index) with the
    * hour as hours-since-2020-01-01 — an exact integer both engines
    * derive identically from the calendar (no epoch/timezone maths).
    * Checkpointed: the signature pass, both verify sides, and the totals
    * all read it. */
  private[graft] def coactivityHours(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d)
      .select(col("user_id"),
        (datediff(to_date(col("ts")), to_date(lit("2020-01-01"))).cast("long")
          * 24 + hour(col("ts"))).as("hk"))
      .distinct()
      .localCheckpoint()

  /** x182's bounded candidate stage: per-user bottom-16 KMV signature
    * (x79's mixer on the hour key), inverted-index self-join on the
    * signature value, crowded buckets (> 512 users) dropped whole. The
    * output is ≤ 16·512·|users| pairs by construction — the linear bound
    * Round10Spec checks against x107's quadratic exact stage. */
  private[graft] def coactivityCandidates(
      uh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sk = uh
      .withColumn("a", expr("hk & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .withColumn("pri", expr("shiftright(a, 16) ^ a"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("pri"))))
      .filter(col("rn") <= 16)
      .select(col("user_id"), col("pri"))
    val bk = sk.withColumn("bsz",
        count(lit(1)).over(Window.partitionBy(col("pri"))))
      .filter(col("bsz") <= 512)
      // ≤16 rows/user; materialized so the self-join reads ONE frame —
      // unmaterialized, both join sides re-ran the whole two-window
      // signature chain (2 exchanges + 2 sorts each, r17 plan dump)
      .localCheckpoint()
    bk.as("a")
      .join(bk.as("b"),
        col("a.pri") === col("b.pri") && col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u1"), col("b.user_id").as("u2"))
      .distinct()
  }

  val entries: Seq[QueryDef] = Seq(

    // CO-ACTIVITY USER SIMILARITY — exact Jaccard over per-user sets of
    // active HOURS, the audience-overlap / sockpuppet-detection primitive
    // (two accounts online in the same hours, every time, are one
    // operator). Candidate pairs come from an inverted index hour →
    // users (x49's co-occurrence shape, Vernica SIGMOD'10): only users
    // sharing an hour ever pair, shared-hour counts fall out of the
    // equi-join group-by, and |A∪B| = |A|+|B|−|A∩B| from broadcast
    // per-user totals — the exact-set identity, one IEEE division.
    //
    // Scale: the pair stage's work is Σ_hours |users-in-hour|² — the
    // crowded-bucket profile every co-occurrence miner has, and the
    // suite's most expensive batch stage by design (6.3M pairs at
    // sf0.1, ~4 s: measured against per-bucket HOF pair expansion and
    // broadcast/packed-key variants, all within noise — the cost IS the
    // pair volume, not the plan). This exact form is the CALIBRATION
    // arm; x182_coactivity_kmv below is the bounded serving arm whose
    // KMV candidate stage is linear in users (r10 closes VERDICT r9
    // item 1). The activity set materializes once
    // (localCheckpoint; both join sides and the totals read it), the
    // hour key partitions the pair shuffle, the pair count combines
    // map-side, per-user totals are a users-sized broadcast, and the
    // report is top-50 via TakeOrderedAndProject. Raw events collapse
    // to DISTINCT (user, hour) before anything pairs, so the stage
    // input is activity-bounded, not event-bounded.
    QueryDef("x107_coactivity_jaccard",
      """WITH uh AS (
        |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
        |), tot AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS nh FROM uh GROUP BY 1
        |), pairs AS (
        |  SELECT a.user_id AS u1, b.user_id AS u2,
        |         CAST(count(*) AS BIGINT) AS shared
        |  FROM uh a JOIN uh b ON a.h = b.h AND a.user_id < b.user_id
        |  GROUP BY 1, 2
        |)
        |SELECT u1, u2, shared, ta.nh AS h1, tb.nh AS h2,
        |       round(1e-9 + shared * 1.0 / (ta.nh + tb.nh - shared), 6)
        |         AS jaccard
        |FROM pairs JOIN tot ta ON ta.user_id = u1
        |           JOIN tot tb ON tb.user_id = u2
        |ORDER BY jaccard DESC, u1, u2 LIMIT 50""".stripMargin) { (s, d) =>
      // materialized once: both the pair join's sides and the totals read
      // it (an unmaterialized subplan would re-scan + re-distinct events
      // once per reference)
      val uh = Tables.events(s, d)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .distinct()
        .localCheckpoint()
      val tot = uh.groupBy(col("user_id")).agg(count(lit(1)).as("nh"))
      val pairs = uh.as("a")
        .join(uh.as("b"),
          col("a.h") === col("b.h") && col("a.user_id") < col("b.user_id"))
        .groupBy(col("a.user_id").as("u1"), col("b.user_id").as("u2"))
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(broadcast(tot.select(col("user_id").as("u1"), col("nh").as("h1"))),
          Seq("u1"))
        .join(broadcast(tot.select(col("user_id").as("u2"), col("nh").as("h2"))),
          Seq("u2"))
        .select(col("u1"), col("u2"), col("shared"), col("h1"), col("h2"),
          Num.roundOut(col("shared") * 1.0
            / (col("h1") + col("h2") - col("shared")), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("u1"), col("u2")).limit(50)
    },

    // CO-ACTIVITY, THE BOUNDED ARM — x107's answer through a KMV
    // candidate stage (VERDICT r9 item 1: x107's exact pair stage is
    // Σ_hours |users|², the one quadratic plan left; THIS is its 100 TB
    // serving path, with x107 as the on-fixture calibration — the x42
    // estimate-then-verify pattern). Three stages:
    //   1. SIGNATURE: per user, the bottom-16 deterministically-hashed
    //      hours of their activity set (x79's KMV sketch over hours
    //      instead of users — same mixer, bit-identical cross-engine).
    //   2. CANDIDATES: an inverted index signature-hash → users; only
    //      users SHARING a signature entry ever pair, and buckets larger
    //      than 512 are dropped whole (x02's crowded-bucket rule — a
    //      globally popular hour says nothing about any specific pair).
    //      Candidate volume is ≤ 16·512·U — LINEAR in users by
    //      construction, vs x107's Σ|users-per-hour|² (6.3M pairs at
    //      sf0.1 → 817k candidates here, none of the 50 top pairs lost).
    //   3. VERIFY: exact Jaccard on the candidates only (the join is
    //      candidate-bounded, never all-pairs) — so every REPORTED
    //      number is exact; the sketch only decides who gets verified.
    // Recall physics (Round10Spec pins the measured values): a pair
    // collides iff the bottom-16 signatures intersect — P ≈ 1−e^(−16·j),
    // > 99.99% for the j ≥ 0.5 sockpuppet pairs the operator hunts, and
    // still 10/10 on the fixture's top-10 at j ≈ 0.09. At a scale where
    // hour-buckets crowd past the cap, the band key composes to hour
    // PAIRS (m19/x39's r=2 knob) — the same three stages, smaller
    // buckets.
    QueryDef("x182_coactivity_kmv",
      """WITH uh AS (
        |  SELECT DISTINCT user_id,
        |         CAST((CAST(ts AS DATE) - DATE '2020-01-01') * 24
        |              + hour(ts) AS BIGINT) AS hk
        |  FROM events
        |), h0 AS (
        |  SELECT user_id, hk, hk & 4294967295 AS a FROM uh
        |), h1 AS (
        |  SELECT user_id, hk,
        |         (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h0
        |), h2 AS (
        |  SELECT user_id, hk,
        |         (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h1
        |), pv AS (
        |  SELECT user_id, hk, xor(a >> 16, a) AS pri FROM h2
        |), sk AS (
        |  SELECT user_id, pri FROM (
        |    SELECT user_id, pri, row_number() OVER (
        |      PARTITION BY user_id ORDER BY pri) AS rn
        |    FROM pv) WHERE rn <= 16
        |), bk AS (
        |  SELECT user_id, pri,
        |         count(*) OVER (PARTITION BY pri) AS bsz
        |  FROM sk
        |), cand AS (
        |  SELECT DISTINCT a.user_id AS u1, b.user_id AS u2
        |  FROM bk a JOIN bk b
        |    ON a.pri = b.pri AND a.user_id < b.user_id
        |  WHERE a.bsz <= 512 AND b.bsz <= 512
        |), tot AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS nh FROM uh GROUP BY 1
        |), sh AS (
        |  SELECT c.u1, c.u2, CAST(count(*) AS BIGINT) AS shared
        |  FROM cand c
        |  JOIN uh a ON a.user_id = c.u1
        |  JOIN uh b ON b.user_id = c.u2 AND b.hk = a.hk
        |  GROUP BY 1, 2
        |)
        |SELECT sh.u1, sh.u2, sh.shared, ta.nh AS h1, tb.nh AS h2,
        |       round(1e-9 + sh.shared * 1.0 / (ta.nh + tb.nh - sh.shared), 6)
        |         AS jaccard
        |FROM sh JOIN tot ta ON ta.user_id = sh.u1
        |        JOIN tot tb ON tb.user_id = sh.u2
        |ORDER BY jaccard DESC, u1, u2 LIMIT 20""".stripMargin) { (s, d) =>
      val uh = coactivityHours(s, d)
      // materialized: without the checkpoint the optimizer collapses the
      // explicit verify-stage repartition below into the distinct's own
      // exchange and AQE re-coalesces it to ~6 byte-sized partitions
      val cand = coactivityCandidates(uh).localCheckpoint()
      // exact verify, candidate-bounded (r17 rework, guide §2.3): the
      // old shape joined cand → uh(u1) → uh(u2, hk), fanning every pair
      // out to |hours(u1)| probe rows (~200M at sf0.1, 37 CPU-s) and
      // re-aggregating them, all in ~6 AQE byte-coalesced tasks. Here
      // each user's DISTINCT hour set rides as ONE array row (uh is
      // already distinct), the pair's shared count is a single exact
      // array_intersect per candidate, and h1/h2 fall out as the array
      // sizes — no fan-out, no re-aggregation, no totals joins. The
      // shared>0 filter reproduces the old inner hour-join's exclusion
      // of signature-collision pairs with no real shared hour. The
      // array table is users-sized — the same broadcast class as the
      // per-user totals the old plan broadcast twice. The explicit
      // repartition spreads the ~8-byte pair rows over the executor
      // cores (each row carries O(|hours|) verify work the byte-based
      // AQE coalescing cannot see); count derives from the runtime.
      val ua = uh.groupBy(col("user_id"))
        .agg(collect_list(col("hk")).as("hks"))
        .localCheckpoint() // users-sized; both verify sides broadcast it
      cand
        .repartition(s.sparkContext.defaultParallelism)
        .join(broadcast(ua.select(col("user_id").as("u1"),
          col("hks").as("ha"))), "u1")
        .join(broadcast(ua.select(col("user_id").as("u2"),
          col("hks").as("hb"))), "u2")
        .select(col("u1"), col("u2"),
          size(array_intersect(col("ha"), col("hb"))).cast("long")
            .as("shared"),
          size(col("ha")).cast("long").as("h1"),
          size(col("hb")).cast("long").as("h2"))
        .filter(col("shared") > 0)
        .select(col("u1"), col("u2"), col("shared"), col("h1"), col("h2"),
          Num.roundOut(col("shared") * 1.0
            / (col("h1") + col("h2") - col("shared")), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("u1"), col("u2")).limit(20)
    },

    // A/B TEST READOUT — the experiment-analysis table: per event type,
    // a two-sample Welch z between the control and treatment arms
    // (deterministic assignment: user_id parity — the hash-bucket split
    // an experimentation platform does), with mean lift and a 5%
    // significance flag. The metric stream quantizes to exact MILLI-unit
    // longs FIRST (x99's move; milli, not micro, because the Σv² moment
    // needs headroom — micro units overflowed int64 at sf0.1; milli keeps
    // Σv² under 2^62 up to ~10^7 rows, past which the moment column
    // widens to DECIMAL(38,0)), so n/Σv/Σv² are exact integers whatever
    // the partition order, and the z statistic is one fixed IEEE
    // expression over those integers (sqrt is correctly-rounded by
    // IEEE-754, hence portable — the x81/x99 precedent).
    //
    // Scale: ONE partial-aggregating pass over events grouped by
    // (event_type); per-arm moments fold as conditional sums inside the
    // same aggregate — adding arms or metrics adds columns, not passes;
    // the readout is event-types-sized.
    QueryDef("x111_ab_test_readout", Analytics.x111OracleSql) { (s, d) =>
      Analytics.abReadout(Analytics.abMoments(Tables.events(s, d)))
    },

    // GROWTH ACCOUNTING — the weekly new/retained/resurrected/churned
    // ledger every growth team reads (the "quick ratio" decomposition):
    // a user's week is 'new' on first-ever activity, 'retained' if active
    // the immediately prior week, 'resurrected' after a gap; churn falls
    // out of conservation — churned(w) = active(w−1) − retained(w) —
    // rather than from a fragile anti-join against the next week.
    //
    // Scale: raw events collapse to DISTINCT (user, week) at the scan;
    // one user-keyed window labels states; the ledger is a weeks-sized
    // aggregate, and the churn lag runs over that tiny table (the single
    // global window touches only O(weeks) rows).
    QueryDef("x109_growth_accounting", Analytics.x109OracleSql) { (s, d) =>
      Analytics.growthLedger(Tables.events(s, d)
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("w"))
        .distinct())
    },

    // SESSION PATH MINING — the top event-type trigrams across q34's
    // 30-minute-gap sessions: the "what do users actually do in a
    // sitting" table that seeds funnel definitions (q77 then measures
    // the chosen one). Sequences materialize per session under the
    // (ts, event_id) total order via array_sort over collected structs
    // (collect_list alone is partition-order-dependent — the sort is
    // what makes the result deterministic), trigrams are a per-row HOF,
    // and each trigram reports occurrences plus distinct sessions.
    //
    // Scale: one user-keyed exchange covers BOTH the session-boundary
    // window and the per-session collect (same partitioning); session
    // arrays are gap-bounded, trigram counts combine map-side, and the
    // report is top-20 via TakeOrderedAndProject.
    QueryDef("x110_session_ngrams",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         sum(new_session) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS sid
        |  FROM marked
        |), seqs AS (
        |  SELECT user_id, sid,
        |         array_agg(event_type ORDER BY ts, event_id) AS seq
        |  FROM sess GROUP BY 1, 2
        |), tg AS (
        |  SELECT user_id, sid,
        |         unnest(list_transform(range(len(seq) - 2), i ->
        |           seq[i+1] || '>' || seq[i+2] || '>' || seq[i+3]))
        |           AS trigram
        |  FROM seqs
        |), ag AS (
        |  SELECT trigram, CAST(count(*) AS BIGINT) AS n_occurrences,
        |         CAST(count(DISTINCT (user_id, sid)) AS BIGINT)
        |           AS n_sessions
        |  FROM tg GROUP BY 1
        |)
        |SELECT trigram, n_occurrences, n_sessions
        |FROM ag ORDER BY n_occurrences DESC, trigram LIMIT 20""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapMicros = 30L * 60L * 1000000L
      val sess = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("new_session")).over(w))
      val seqs = sess.groupBy(col("user_id"), col("sid"))
        .agg(array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("ev"))
        .select(col("user_id"), col("sid"),
          transform(col("ev"), e => e.getField("event_type")).as("seq"))
      val tg = seqs.select(col("user_id"), col("sid"),
        explode(when(size(col("seq")) < 3, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("seq")) - 3), i =>
            concat_ws(">", element_at(col("seq"), i + 1),
              element_at(col("seq"), i + 2),
              element_at(col("seq"), i + 3))))).as("trigram"))
      tg.groupBy(col("trigram"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("user_id"), col("sid")).as("n_sessions"))
        .orderBy(col("n_occurrences").desc, col("trigram")).limit(20)
    },

    // Conversion funnel view → click → purchase with STRICT event-order
    // semantics: each stage's timestamp must be strictly after the prior
    // stage's (min-after-join, not min-overall — a click before the first
    // view does not convert). Three user-keyed aggregates, each input
    // pruned by event type at the scan; the stage joins are per-user
    // singletons, so AQE broadcasts the later (smaller) stages.
    // Timestamps surface as epoch micros — exact longs on both engines
    // (Spark reads the ns fixture truncated to micros; DuckDB's epoch_us
    // truncates identically).
    QueryDef("q77_funnel",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t_buy
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |)
        |SELECT v.user_id, epoch_us(v.t_view) AS view_us,
        |       epoch_us(c.t_click) AS click_us, epoch_us(p.t_buy) AS buy_us,
        |       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
        |         AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id") &&
          col("e.ts") > col("v.t_view"))
        .groupBy(col("e.user_id").as("user_id"))
        .agg(min(col("e.ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), col("e.user_id") === col("c.user_id") &&
          col("e.ts") > col("c.t_click"))
        .groupBy(col("e.user_id").as("user_id"))
        .agg(min(col("e.ts")).as("t_buy"))
      v.join(c.withColumnRenamed("user_id", "cu"),
          col("user_id") === col("cu"), "left")
        .join(p.withColumnRenamed("user_id", "pu"),
          col("user_id") === col("pu"), "left")
        .select(col("user_id"),
          unix_micros(col("t_view")).as("view_us"),
          unix_micros(col("t_click")).as("click_us"),
          unix_micros(col("t_buy")).as("buy_us"),
          when(col("pu").isNotNull, 3L).when(col("cu").isNotNull, 2L)
            .otherwise(1L).as("stage"))
        .orderBy(col("user_id"))
    },

    // Weekly cohort retention on purchase activity: cohort = week of
    // first purchase, retention = share of the cohort purchasing in week
    // cohort+k. Cohort assignment and the activity set are both user-
    // keyed aggregates; cohort sizes are a tiny broadcast; offsets are
    // exact integer day-diffs (both ends week-truncated) so `div 7` is
    // exact. The retention ratio divides two exact longs — one IEEE
    // division, bit-stable.
    QueryDef("q78_retention_cohorts", Analytics.q78OracleSql) { (s, d) =>
      val purch = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val f = purch.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      val a = purch
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      val sz = f.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
      f.join(a, Seq("user_id"))
        .groupBy(col("cohort"), col("w"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sz), Seq("cohort"))
        .select(col("cohort").cast("date").as("cohort_week"),
          expr("CAST(datediff(w, cohort) div 7 AS BIGINT)").as("offset_w"),
          col("n_active"), col("n_cohort"),
          Num.roundOut(col("n_active") * 1.0 / col("n_cohort"), 4)
            .as("retention"))
        .orderBy(col("cohort_week"), col("offset_w"))
    },

    // SCD Type-2 history build: derive each user's spend-tier timeline
    // from purchase events — keep only CHANGE rows (lag ≠ current) and
    // close each version with the next change's timestamp (lead; null =
    // current version). The dedup-to-changes and validity-interval
    // windows share one user-keyed exchange (subset rule: the second
    // window's partitioning is satisfied by the first's). This is the
    // batch construction of the table q14's SCD-1 merge keeps only the
    // LATEST row of.
    QueryDef("q79_scd2_history",
      """WITH tiers AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN value < 5 THEN 'low' WHEN value < 15 THEN 'mid'
        |              ELSE 'high' END AS tier
        |  FROM events WHERE event_type = 'purchase'
        |), changes AS (
        |  SELECT user_id, ts, event_id, tier,
        |         lag(tier) OVER w AS prev_tier
        |  FROM tiers WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), hist AS (
        |  SELECT user_id, tier, ts, event_id
        |  FROM changes WHERE prev_tier IS NULL OR tier <> prev_tier
        |)
        |SELECT user_id, tier, epoch_us(ts) AS valid_from_us,
        |       epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id)) AS valid_to_us
        |FROM hist ORDER BY user_id, valid_from_us""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tiers = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("value") < 5, "low").when(col("value") < 15, "mid")
            .otherwise("high").as("tier"))
      tiers
        .withColumn("prev_tier", lag(col("tier"), 1).over(w))
        .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("tier"),
          unix_micros(col("ts")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"))
        .orderBy(col("user_id"), col("valid_from_us"))
    },

    // Triangle counting on x37's synthetic link graph — the canonical
    // multi-way self-join. Edges canonicalize to a < b (each triangle
    // enumerated once, as x < y < z); the two-hop join plus closing-edge
    // check is the standard relational triangle plan. The edge list here
    // is tiny and broadcasts; at web scale the same query runs as
    // degree-ordered partitioned joins (each join still an equi-join —
    // nothing in the shape is driver-bound).
    QueryDef("q80_triangles",
      """WITH e0 AS (
        |  SELECT DISTINCT CAST(doc_id % 20 AS INT) AS src,
        |         CAST((doc_id // 20) % 20 AS INT) AS dst
        |  FROM documents
        |  WHERE doc_id < 400 AND (doc_id * 48271) % 100 < 18
        |    AND CAST(doc_id % 20 AS INT) <> CAST((doc_id // 20) % 20 AS INT)
        |), u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0
        |)
        |SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |FROM u e1 JOIN u e2 ON e1.b = e2.a
        |          JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b
        |ORDER BY x, y, z""".stripMargin) { (s, d) =>
      val e0 = Tables.documents(s, d)
        .filter(col("doc_id") < 400 && (col("doc_id") * 48271) % 100 < 18)
        .select((col("doc_id") % 20).cast("int").as("src"),
          expr("CAST((doc_id div 20) % 20 AS INT)").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val u = e0.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val e1 = u.select(col("a").as("x"), col("b").as("y"))
      val e2 = u.select(col("a").as("y2"), col("b").as("z"))
      val e3 = u.select(col("a").as("x3"), col("b").as("z3"))
      e1.join(e2, col("y") === col("y2"))
        .join(e3, col("x") === col("x3") && col("z") === col("z3"))
        .select(col("x"), col("y"), col("z"))
        .orderBy(col("x"), col("y"), col("z"))
    },

    // Calendar densification + forward fill — the time-series gap repair
    // every reporting pipeline runs before charting or windowed models:
    // materialize the full (entity × day) grid, mark gaps, and carry the
    // last observation forward. The calendar is a tiny broadcast (one row
    // per day); the grid cross join is |entities|×|days| — intentional
    // and bounded, never |events|²; the fill is one user-keyed window
    // (last with ignoreNulls), which shares the grid join's partitioning.
    // Day values are rounded BEFORE the fill so the carried value is the
    // same exact double on both engines.
    QueryDef("q83_gap_fill",
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         round(1e-9 + sum(value), 4) AS day_value
        |  FROM events WHERE event_type = 'purchase' AND user_id < 40
        |  GROUP BY user_id, CAST(ts AS DATE)
        |), bounds AS (
        |  SELECT CAST(min(CAST(ts AS DATE)) AS DATE) AS d0,
        |         CAST(max(CAST(ts AS DATE)) AS DATE) AS d1 FROM events
        |), cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |              AS DATE) AS day
        |  FROM bounds
        |), grid AS (
        |  SELECT u.user_id, c.day
        |  FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN cal c
        |), joined AS (
        |  SELECT g.user_id, g.day, d.day_value,
        |         CASE WHEN d.day_value IS NULL THEN 1 ELSE 0 END AS is_gap
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day = d.day
        |)
        |SELECT user_id, day,
        |       last_value(day_value IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |       CAST(is_gap AS BIGINT) AS is_gap
        |FROM joined ORDER BY user_id, day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val daily = ev
        .filter(col("event_type") === "purchase" && col("user_id") < 40)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(Num.roundOut(sum(col("value")), 4).as("day_value"))
      val cal = ev
        .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val grid = daily.select(col("user_id")).distinct()
        .crossJoin(broadcast(cal))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("day_value"), ignoreNulls = true).over(w).as("filled"),
          when(col("day_value").isNull, 1L).otherwise(0L).as("is_gap"))
        .orderBy(col("user_id"), col("day"))
    },

    // BREADTH-FIRST SEARCH / shortest hop-distance from a seed — the
    // iterative-graph shape (q80's synthetic link graph, source node 0,
    // ≤ 6 supersteps) the ANSI engine writes as WITH RECURSIVE and Spark
    // writes as a FRONTIER loop: each superstep joins only the nodes
    // DISCOVERED LAST ROUND against the adjacency list (the Pregel /
    // GraphX delta-iteration), unions into the distance table, and
    // localCheckpoints to truncate lineage — the checkpoint every
    // iterative Spark job needs so superstep k doesn't replay supersteps
    // 1..k-1. The recursion is bounded (6 hops) on BOTH engines, so the
    // fixed-point is identical whatever the physical iteration order.
    //
    // Scale: per superstep the shuffle carries |frontier ⋈ adjacency|
    // rows keyed by node — never the whole distance table — and the loop
    // EXITS the moment the frontier empties (isEmpty guard), so a
    // small-diameter graph never pays all 6 rounds. At 100 TB this is one
    // adjacency-keyed equi-join per round, exactly GraphX's message
    // aggregation without the RDD detour. GraphLateralSpec pins the BFS
    // layering invariant (|d(u)−d(v)| ≤ 1 across every edge).
    QueryDef("q84_bfs",
      """WITH RECURSIVE e0 AS (
        |  SELECT DISTINCT CAST(doc_id % 20 AS INT) AS src,
        |         CAST((doc_id // 20) % 20 AS INT) AS dst
        |  FROM documents
        |  WHERE doc_id < 400 AND (doc_id * 48271) % 100 < 18
        |    AND CAST(doc_id % 20 AS INT) <> CAST((doc_id // 20) % 20 AS INT)
        |), u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0
        |), adj AS (
        |  SELECT a AS src, b AS dst FROM u
        |  UNION ALL
        |  SELECT b, a FROM u
        |), bfs AS (
        |  SELECT CAST(0 AS INT) AS node, CAST(0 AS INT) AS dist
        |  UNION
        |  SELECT adj.dst, CAST(bfs.dist + 1 AS INT)
        |  FROM bfs JOIN adj ON adj.src = bfs.node
        |  WHERE bfs.dist < 6
        |)
        |SELECT node, CAST(min(dist) AS INT) AS dist
        |FROM bfs GROUP BY node ORDER BY node""".stripMargin) { (s, d) =>
      val e0 = Tables.documents(s, d)
        .filter(col("doc_id") < 400 && (col("doc_id") * 48271) % 100 < 18)
        .select((col("doc_id") % 20).cast("int").as("src"),
          expr("CAST((doc_id div 20) % 20 AS INT)").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val u = e0.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val adj = u.select(col("a").as("src"), col("b").as("dst"))
        .union(u.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint()
      var dist = s.range(1)
        .select(lit(0).cast("int").as("node"), lit(0).cast("int").as("dist"))
        .localCheckpoint()
      var frontier = dist
      var h = 1
      while (h <= 6 && !frontier.isEmpty) {
        val nxt = frontier.join(adj, frontier("node") === adj("src"))
          .select(adj("dst").as("node"), lit(h).cast("int").as("dist"))
        val merged = dist.union(nxt)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint()
        frontier = merged.filter(col("dist") === h)
        dist = merged
        h += 1
      }
      dist.orderBy(col("node"))
    },

    // RECENCY-DECAYED ENGAGEMENT — the exponential-decay feature every
    // recsys/engagement model wants (recent activity outweighs old), with
    // the decay computed as INTEGER HALF-LIFE SHIFTS: weight 1/2^(age/7d)
    // applied as `vfp >> (age div 7)` on 1e-4-fixed-point values — no
    // exp()/pow() libm (x23's lesson), so every partial sum is an exact
    // long, order-independent across partitions, and both engines rank
    // the identical top-20. The anchor is max(event date) — re-ingestion-
    // stable, no wall clock (the suite's no-RNG/no-now contract).
    //
    // Scale: one partial-agg pass over events (the shift happens map-side
    // per row); the anchor is a one-row broadcast; state per user is two
    // longs — the mergeable-feature shape a daily feature-store job
    // emits. Truncation from the integer shift under-weights each event
    // by < 1 ulp of its bucket — identically on both engines.
    QueryDef("x87_decayed_engagement",
      """WITH a AS (
        |  SELECT max(CAST(ts AS DATE)) AS anchor FROM events
        |), w AS (
        |  SELECT user_id,
        |         CAST(floor(value * 10000) AS BIGINT) AS vfp,
        |         CAST(least(date_diff('day', CAST(ts AS DATE), a.anchor) // 7,
        |                    62) AS INT) AS s
        |  FROM events, a
        |), g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(vfp) AS BIGINT) AS raw_fp,
        |         CAST(sum(vfp >> s) AS BIGINT) AS dec_fp
        |  FROM w GROUP BY 1
        |)
        |SELECT user_id, n_events,
        |       round(1e-9 + raw_fp / 10000.0, 4) AS raw_value,
        |       round(1e-9 + dec_fp / 10000.0, 4) AS decayed_value
        |FROM g ORDER BY dec_fp DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"), to_date(col("ts")).as("day"))
      val anchor = ev.agg(max(col("day")).as("anchor"))
      val w = ev.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          floor(col("value") * 10000).cast("long").as("vfp"),
          expr("CAST(least(datediff(anchor, day) div 7, 62) AS INT)").as("s"))
      val g = w.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("vfp")).as("raw_fp"),
          sum(expr("shiftright(vfp, s)")).as("dec_fp"))
      g.orderBy(col("dec_fp").desc, col("user_id")).limit(20)
        .select(col("user_id"), col("n_events"),
          Num.roundOut(col("raw_fp") / 10000.0, 4).as("raw_value"),
          Num.roundOut(col("dec_fp") / 10000.0, 4).as("decayed_value"))
    },

    // ROBUST OUTLIER REPORT per event type: median and MAD by RANK
    // SELECTION (lower median — the value at row_number (n+1)/2 under a
    // total (value, event_id) order), outlier = |v − med| > 3·MAD. Rank
    // selection instead of interpolating percentiles keeps every
    // reported statistic an ACTUAL data value — no midpoint arithmetic,
    // so cross-engine parity needs only a shared total order (ties break
    // by event_id; nulls are filtered explicitly because the engines'
    // default null sort order differs). The two medians share one
    // type-keyed exchange each; the deviation pass re-reads the events
    // scan with the 5-row median table broadcast.
    //
    // Scale: this is the exact CALIBRATION arm (the serving path at
    // 100 TB is x27's mergeable KLL sketch — same report, O(1/ε) state,
    // validated against this per release), but even the exact arm must
    // not sort whole event types on single reducers (VERDICT r8 item 3):
    // each median is [[Ranks.twoPassRank]] over broadcast per-type
    // value-range buckets — every bucket sorts in parallel, the offset
    // table is types×32 rows. The outlier COUNT then needs only the
    // broadcast (med, mad) thresholds — a pure scan-side pass.
    QueryDef("x94_mad_outliers",
      """WITH v AS (
        |  SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL
        |), r AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM v
        |), med AS (
        |  SELECT event_type, value AS med FROM r WHERE rn = (n + 1) // 2
        |), ad AS (
        |  SELECT v.event_type, v.event_id, med.med,
        |         abs(v.value - med.med) AS adiff
        |  FROM v JOIN med USING (event_type)
        |), r2 AS (
        |  SELECT event_type, med, adiff,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY adiff, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ad
        |), mad AS (
        |  SELECT event_type, med, adiff AS mad FROM r2 WHERE rn = (n + 1) // 2
        |)
        |SELECT a.event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(1e-9 + m.med, 4) AS med,
        |       round(1e-9 + m.mad, 4) AS mad,
        |       CAST(sum(CASE WHEN a.adiff > 3 * m.mad THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers,
        |       round(1e-9 + max(a.adiff), 4) AS max_adiff
        |FROM ad a JOIN mad m USING (event_type)
        |GROUP BY a.event_type, m.med, m.mad
        |ORDER BY a.event_type""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("value"))
      // lower median by distributed rank SELECTION: the exponent-bucket
      // histogram locates the holding bucket per type (no bounds pass);
      // only that bucket's rows ever sort — 2 passes per median
      def lowerMedian(in: org.apache.spark.sql.DataFrame, c: String) =
        Ranks.rankSelect(in, Seq("event_type"),
          Ranks.expBucket(col(c)),
          Seq(col(c), col("event_id")),
          n => shiftright(n + 1, 1)) // (n + 1) div 2, exact on longs
      val med = lowerMedian(v, "value")
        .select(col("event_type"), col("value").as("med"))
      val ad = v.join(broadcast(med), "event_type")
        .withColumn("adiff", abs(col("value") - col("med")))
      val mad = lowerMedian(ad, "adiff")
        .select(col("event_type"), col("med"), col("adiff").as("mad"))
      ad.select(col("event_type"), col("adiff"))
        .join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("adiff") > col("mad") * 3, 1L).otherwise(0L))
            .as("n_outliers"),
          max(col("adiff")).as("max_adiff"))
        .select(col("event_type"), col("n"),
          Num.roundOut(col("med"), 4).as("med"),
          Num.roundOut(col("mad"), 4).as("mad"),
          col("n_outliers"),
          Num.roundOut(col("max_adiff"), 4).as("max_adiff"))
        .orderBy(col("event_type"))
    },

    // EXACT PER-GROUP QUANTILE REPORT BY RANK SELECTION — the general
    // form of x94's median device, promoted to a first-class operator:
    // per source, the lower quartiles (p25/p50/p75) of document length
    // as ACTUAL DATA VALUES at ranks ⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉ under the
    // total (n_chars, doc_id) order — no interpolation (q32's
    // percentile_cont interpolates; a sketch approximates; this is the
    // exact arm both calibrate against). All three quantiles come off
    // ONE rank pass: filter to the three target ranks, then a 3-row-
    // per-group conditional aggregate.
    //
    // Scale: the rank is [[Ranks.twoPassRank]] over n_chars-range
    // buckets — source is low-cardinality (the r8 x53 lesson: a bare
    // per-source window is a quarter-corpus sort on one reducer), so
    // buckets within source do the parallel work and the offset table
    // stays sources×buckets rows. One scan, one bounded-key exchange.
    QueryDef("x147_rank_quantiles",
      """WITH r AS (
        |  SELECT source, n_chars, doc_id,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |       CAST(min(CASE WHEN rn = (n + 3) // 4 THEN n_chars END)
        |            AS BIGINT) AS p25,
        |       CAST(min(CASE WHEN rn = (n + 1) // 2 THEN n_chars END)
        |            AS BIGINT) AS p50,
        |       CAST(min(CASE WHEN rn = (3 * n + 3) // 4 THEN n_chars END)
        |            AS BIGINT) AS p75
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val ranked = Ranks.twoPassRank(docs, Seq("source"),
        expr("n_chars div 64").cast("int"),
        Seq(col("n_chars"), col("doc_id")))
      ranked.join(broadcast(counts), "source")
        .filter(col("rn") === expr("(n + 3) div 4")
          || col("rn") === expr("(n + 1) div 2")
          || col("rn") === expr("(3 * n + 3) div 4"))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"),
          min(when(col("rn") === expr("(n + 3) div 4"), col("n_chars")))
            .as("p25"),
          min(when(col("rn") === expr("(n + 1) div 2"), col("n_chars")))
            .as("p50"),
          min(when(col("rn") === expr("(3 * n + 3) div 4"), col("n_chars")))
            .as("p75"))
        .orderBy(col("source"))
    },

    // INTEGER-EWMA ANOMALY SCAN — the exponentially-weighted moving
    // average (α = 0.2) over each type's daily count series, in EXACT
    // deci-unit integers: e_t = (2·10·v_t + 8·e_{t−1}) div 10, seeded
    // from day 1 — the online smoother a monitoring pipeline runs,
    // with day t flagged anomalous when its deviation from the PRIOR
    // smoothed level exceeds 50% (2·|10v − e| > e, pure integers, so
    // both engines fold bit-identically — no float smoothing drift).
    // x119 (CUSUM changepoint) finds the single largest level break;
    // this counts every transient spike against an adaptive baseline.
    //
    // Scale: the fold is inherently sequential, so it runs ON THE
    // AGGREGATED DAY SERIES ONLY (days × types rows — the x18 bounded-
    // series rule): one hash aggregate collapses the corpus, then the
    // array fold is per-type O(days) driver-free column work. The raw
    // events never see a window or a sort.
    QueryDef("x151_ewma_anomaly",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2
        |), ser AS (
        |  SELECT event_type,
        |         CAST(count(*) AS BIGINT) AS n_days,
        |         list(10 * cnt ORDER BY day) AS vs
        |  FROM daily GROUP BY event_type
        |), folded AS (
        |  SELECT event_type, n_days,
        |         list_reduce(
        |           list_transform(vs, x -> struct_pack(
        |             na := CAST(0 AS BIGINT), md := CAST(0 AS BIGINT),
        |             e := x)),
        |           (acc, x) -> struct_pack(
        |             na := acc.na + CASE WHEN 2 * abs(x.e - acc.e) > acc.e
        |                                 THEN 1 ELSE 0 END,
        |             md := greatest(acc.md, abs(x.e - acc.e)),
        |             e := (2 * x.e + 8 * acc.e) // 10)) AS f
        |  FROM ser
        |)
        |SELECT event_type, n_days, f.e AS ewma_deci,
        |       f.na AS n_anomalies, f.md AS max_dev_deci
        |FROM folded ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          array_sort(collect_list(struct(col("day"), (col("cnt") * 10)
            .as("v")))).as("sv"))
        .withColumn("vs", expr("transform(sv, p -> p.v)"))
        // seed = first element, fold the tail — list_reduce's contract,
        // reproduced with aggregate() over slice(2..). Field ORDER
        // matters on the DuckDB side: its list_reduce rebinds acc
        // fields sequentially (na computed after e would see the NEW
        // e), so both engines list `e` LAST — na/md read the prior
        // level, e updates afterwards. Spark's aggregate() evaluates
        // against the original acc either way; mirrored for symmetry.
        .withColumn("f", expr(
          """aggregate(
            |  slice(vs, 2, greatest(size(vs) - 1, 0)),
            |  named_struct('na', CAST(0 AS BIGINT),
            |               'md', CAST(0 AS BIGINT), 'e', vs[0]),
            |  (acc, x) -> named_struct(
            |    'na', acc.na + CASE WHEN 2 * abs(x - acc.e) > acc.e
            |                        THEN 1L ELSE 0L END,
            |    'md', greatest(acc.md, abs(x - acc.e)),
            |    'e', (2 * x + 8 * acc.e) div 10))""".stripMargin))
        .select(col("event_type"), col("n_days"),
          col("f.e").as("ewma_deci"), col("f.na").as("n_anomalies"),
          col("f.md").as("max_dev_deci"))
        .orderBy(col("event_type"))
    },

    // EQUI-DEPTH HISTOGRAM SELF-JOIN VALIDATION — the optimizer-
    // statistics operator behind every CBO join estimate: an 8-bucket
    // equi-depth histogram over the user_id key (whole keys per bucket,
    // cut by DISTINCT-key rank so no key straddles a boundary), the
    // uniformity-assumption self-join estimate r²/d per bucket, and the
    // EXACT self-join size Σc² it would be planning for — the per-
    // bucket underestimate (≥ 0 by Cauchy–Schwarz, so the ppm division
    // never goes negative — engines disagree on negative integer
    // division, DuckDB floors where Spark truncates) IS the intra-
    // bucket skew a planner misses; x78 makes the same estimate from a
    // CountMin sketch, this is the histogram arm. All-integer: counts,
    // squares, and two integer divisions.
    //
    // Scale: the key table is one hash aggregate; its global rank is
    // [[Ranks.twoPassRank]] over exponent buckets of the key (no
    // single-reducer sort of the key table — the r8 lesson applied to a
    // keys-sized input); the report is 8 rows.
    QueryDef("x152_histogram_selfjoin",
      """WITH kc AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT user_id, cnt, row_number() OVER (ORDER BY user_id) AS rn,
        |         count(*) OVER () AS nk
        |  FROM kc
        |), b AS (
        |  SELECT CAST(((rn - 1) * 8) // nk AS INT) AS bucket_id,
        |         user_id, cnt
        |  FROM r
        |), g AS (
        |  SELECT bucket_id, CAST(count(*) AS BIGINT) AS n_users,
        |         CAST(sum(cnt) AS BIGINT) AS n_rows,
        |         CAST(sum(cnt * cnt) AS BIGINT) AS actual_selfjoin,
        |         CAST(min(user_id) AS BIGINT) AS lo_user,
        |         CAST(max(user_id) AS BIGINT) AS hi_user
        |  FROM b GROUP BY bucket_id
        |)
        |SELECT bucket_id, n_users, n_rows, lo_user, hi_user,
        |       CAST((n_rows * n_rows) // n_users AS BIGINT) AS est_selfjoin,
        |       actual_selfjoin,
        |       CAST((actual_selfjoin - (n_rows * n_rows) // n_users)
        |            * 1000000 // actual_selfjoin AS BIGINT) AS underest_ppm
        |FROM g ORDER BY bucket_id""".stripMargin) { (s, d) =>
      val kc = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val nk = kc.agg(count(lit(1)).as("nk"))
      Ranks.twoPassRank(kc, Nil,
          Ranks.expBucket(col("user_id").cast("double")),
          Seq(col("user_id")))
        .crossJoin(broadcast(nk))
        .withColumn("bucket_id", expr("((rn - 1) * 8) div nk").cast("int"))
        .groupBy(col("bucket_id"))
        .agg(count(lit(1)).as("n_users"), sum(col("cnt")).as("n_rows"),
          sum(col("cnt") * col("cnt")).as("actual_selfjoin"),
          min(col("user_id")).as("lo_user"),
          max(col("user_id")).as("hi_user"))
        .select(col("bucket_id"), col("n_users"), col("n_rows"),
          col("lo_user"), col("hi_user"),
          expr("(n_rows * n_rows) div n_users").as("est_selfjoin"),
          col("actual_selfjoin"),
          expr("""(actual_selfjoin - (n_rows * n_rows) div n_users)
                 | * 1000000 div actual_selfjoin""".stripMargin)
            .as("underest_ppm"))
        .orderBy(col("bucket_id"))
    },

    // V-OPTIMAL HISTOGRAM ERROR CURVE (Jagadish et al., VLDB'98) — the
    // other half of x152's CBO-statistics story: x152 validates an
    // EQUI-DEPTH histogram's self-join estimate; this builds the
    // optimal-SSE partition and prices how much equi-width leaves on
    // the table. The document-length domain collapses to ≤32 equi-width
    // base buckets (one corpus pass, integer bucket math); the dynamic
    // program over those atoms — SSE(i,j) from prefix (n, Σv, Σv²),
    // E_k(j) = min_p E_{k−1}(p) + SSE(p+1, j) — is UNROLLED for
    // k = 1..4 as four bounded joins (≤32² candidate rows each): the
    // iterative-DP-as-relational pattern, no driver loop, no window
    // (present buckets re-index by a triangular self-join, not a rank).
    // Interval SSE = (Δsq − Δs²/Δn) is one double expression of exact
    // longs (Δs² ≤ 3·10¹⁶ at sf0.1 as an exact double product; the
    // x142 DOUBLE note applies past ~10⁹ total chars per interval);
    // the same-shaped chain of pairwise adds keeps every candidate
    // identical cross-engine, and the equi-width arm's 4 group SSEs
    // round to milli units and sum AS INTEGERS (the x179 device).
    //
    // Scale: everything after the 32-bucket aggregate is bounded. At
    // 100 TB the base-bucket count B is the knob (DP is O(k·B²) rows);
    // the corpus is touched exactly once.
    QueryDef("x181_voptimal_histogram",
      """WITH mm AS (
        |  SELECT CAST(min(n_chars) AS BIGINT) AS lo,
        |         CAST(max(n_chars) AS BIGINT) AS hi
        |  FROM documents
        |), bkt AS (
        |  SELECT CAST(((n_chars - mm.lo) * 32) // (mm.hi - mm.lo + 1)
        |              AS BIGINT) AS b,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(n_chars) AS BIGINT) AS s,
        |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sq
        |  FROM documents CROSS JOIN mm GROUP BY 1
        |), idx AS (
        |  SELECT a.b, CAST(count(*) AS BIGINT) AS id, a.n, a.s, a.sq
        |  FROM bkt a JOIN bkt c ON c.b <= a.b
        |  GROUP BY a.b, a.n, a.s, a.sq
        |), pre AS (
        |  SELECT a.id, CAST(sum(c.n) AS BIGINT) AS pn,
        |         CAST(sum(c.s) AS BIGINT) AS ps,
        |         CAST(sum(c.sq) AS BIGINT) AS psq
        |  FROM idx a JOIN idx c ON c.id <= a.id GROUP BY a.id
        |  UNION ALL SELECT 0, 0, 0, 0
        |), er AS (
        |  SELECT i.id + 1 AS i, j.id AS j,
        |         (j.psq - i.psq)
        |           - (j.ps - i.ps) * 1.0 * (j.ps - i.ps)
        |             / (j.pn - i.pn) AS e
        |  FROM pre i JOIN pre j ON j.id > i.id
        |), e1 AS (SELECT j, e FROM er WHERE i = 1),
        |e2 AS (
        |  SELECT er.j, min(e1.e + er.e) AS e
        |  FROM e1 JOIN er ON er.i = e1.j + 1 GROUP BY er.j
        |), e3 AS (
        |  SELECT er.j, min(e2.e + er.e) AS e
        |  FROM e2 JOIN er ON er.i = e2.j + 1 GROUP BY er.j
        |), e4 AS (
        |  SELECT er.j, min(e3.e + er.e) AS e
        |  FROM e3 JOIN er ON er.i = e3.j + 1 GROUP BY er.j
        |), fin AS (SELECT max(id) AS nb FROM idx),
        |ewm AS (
        |  SELECT CAST(sum(CAST(round(1e-9
        |             + (sq - s * 1.0 * s / n) * 1000) AS BIGINT))
        |           AS BIGINT) AS milli
        |  FROM (SELECT b // 8 AS g, CAST(sum(n) AS BIGINT) AS n,
        |               CAST(sum(s) AS BIGINT) AS s,
        |               CAST(sum(sq) AS BIGINT) AS sq
        |        FROM bkt GROUP BY 1)
        |)
        |SELECT k, method, sse FROM (
        |  SELECT CAST(1 AS BIGINT) AS k, 'voptimal' AS method,
        |         CAST(round(1e-9 + e1.e) AS BIGINT) AS sse
        |  FROM e1 JOIN fin ON e1.j = fin.nb
        |  UNION ALL
        |  SELECT 2, 'voptimal', CAST(round(1e-9 + e2.e) AS BIGINT)
        |  FROM e2 JOIN fin ON e2.j = fin.nb
        |  UNION ALL
        |  SELECT 3, 'voptimal', CAST(round(1e-9 + e3.e) AS BIGINT)
        |  FROM e3 JOIN fin ON e3.j = fin.nb
        |  UNION ALL
        |  SELECT 4, 'voptimal', CAST(round(1e-9 + e4.e) AS BIGINT)
        |  FROM e4 JOIN fin ON e4.j = fin.nb
        |  UNION ALL
        |  SELECT 4, 'equiwidth',
        |         CAST(round(1e-9 + milli / 1000.0) AS BIGINT)
        |  FROM ewm
        |) ORDER BY method, k""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("n_chars"))
      val mm = docs.agg(min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"))
      val bkt = docs.crossJoin(broadcast(mm))
        .select(expr("((n_chars - lo) * 32) div (hi - lo + 1)").as("b"),
          col("n_chars"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"),
          sum(col("n_chars") * col("n_chars")).as("sq"))
        .coalesce(1) // ≤32 rows — one partition, or every downstream
        // stage over the checkpointed RDD inherits the shuffle's 32
        .localCheckpoint() // ≤32 rows; idx/prefix/equi-width read it
      val idx = bkt.as("a")
        .join(bkt.select(col("b").as("cb")), col("cb") <= col("b"))
        .groupBy(col("b"), col("n"), col("s"), col("sq"))
        .agg(count(lit(1)).as("id"))
        .coalesce(1)
        .localCheckpoint() // <=32 rows; pre reads it twice, fin once
      val pre = idx.as("a")
        .join(idx.select(col("id").as("cid"), col("n").as("cn"),
          col("s").as("cs"), col("sq").as("csq")), col("cid") <= col("id"))
        .groupBy(col("id"))
        .agg(sum(col("cn")).as("pn"), sum(col("cs")).as("ps"),
          sum(col("csq")).as("psq"))
        .unionByName(idx.sparkSession.range(1)
          .select(lit(0L).as("id"), lit(0L).as("pn"), lit(0L).as("ps"),
            lit(0L).as("psq")))
        .coalesce(1) // the pair join below is a CARTESIAN of the two
        // sides' partition lists — at 33 partitions each that was a
        // 1089-task stage per DP read (r16: THE x181 cost, 1089-task
        // stages over 528 rows); at 1×1 it is one task
        .localCheckpoint() // ≤33 rows; the er pair join reads it twice
      val er = pre.select(col("id").as("i0"), col("pn").as("ipn"),
          col("ps").as("ips"), col("psq").as("ipsq"))
        .join(pre.select(col("id").as("j"), col("pn").as("jpn"),
          col("ps").as("jps"), col("psq").as("jpsq")), col("j") > col("i0"))
        .select((col("i0") + 1).as("i"), col("j"),
          ((col("jpsq") - col("ipsq"))
            - (col("jps") - col("ips")) * 1.0 * (col("jps") - col("ips"))
              / (col("jpn") - col("ipn"))).as("e"))
        .coalesce(1)
        .localCheckpoint() // ≤32² rows; four DP levels read it
      val e1v = er.filter(col("i") === 1).select(col("j"), col("e"))
      // each DP level is <=32 rows and feeds BOTH its pick and the next
      // level -- checkpointed (r16) so the final five-way union
      // evaluates every level once (e2 was computed three times, e3
      // twice, and fin's idx re-aggregation ran once per pick)
      def level(prev: org.apache.spark.sql.DataFrame) =
        prev.select(col("j").as("p"), col("e").as("pe"))
          .join(er, col("i") === col("p") + 1)
          .groupBy(col("j")).agg(min(col("pe") + col("e")).as("e"))
          .coalesce(1)
          .localCheckpoint()
      val e2v = level(e1v); val e3v = level(e2v); val e4v = level(e3v)
      val fin = idx.agg(max(col("id")).as("nb")).localCheckpoint()
      def pick(ek: org.apache.spark.sql.DataFrame, k: Int) =
        ek.join(broadcast(fin), col("j") === col("nb"))
          .select(lit(k.toLong).as("k"), lit("voptimal").as("method"),
            round(lit(1e-9) + col("e")).cast("long").as("sse"))
      val ew = bkt.groupBy(expr("b div 8").as("g"))
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
          sum(col("sq")).as("sq"))
        .select(round(lit(1e-9)
          + (col("sq") - col("s") * 1.0 * col("s") / col("n")) * 1000)
          .cast("long").as("cm"))
        .agg(sum(col("cm")).as("milli"))
        .select(lit(4L).as("k"), lit("equiwidth").as("method"),
          round(lit(1e-9) + col("milli") / 1000.0).cast("long").as("sse"))
      pick(e1v, 1).unionByName(pick(e2v, 2)).unionByName(pick(e3v, 3))
        .unionByName(pick(e4v, 4)).unionByName(ew)
        .orderBy(col("method"), col("k"))
    },

    // EVENT TRANSITION MATRIX — the per-user next-event Markov table
    // (from_type → to_type counts and row-conditional probabilities)
    // behind funnel design and anomaly detection: which step follows
    // which, empirically. Successor pairs come from one lead() window
    // under the (ts, event_id) total order; the row-normalizer is a
    // types-sized broadcast. The probability is one exact-long division.
    //
    // Scale: ONE user-keyed exchange for the window (the q34/q13 spine);
    // pairs collapse map-side to a types² partial — the matrix is O(25)
    // rows at any corpus size. The last event per user emits no pair
    // (lead = null), matching the open-ended session semantics.
    QueryDef("x95_event_transitions", Analytics.x95OracleSql) { (s, d) =>
      transReport(transCounts(s, d))
    },

    // POINT-IN-TIME-CORRECT FEATURE ASSEMBLY — the feature-store join
    // that builds a leakage-free training set: per label event (a
    // purchase), the user's last click value STRICTLY BEFORE the label
    // and the running view count STRICTLY BEFORE it. "Strictly before"
    // is where leakage hides: a same-instant feature must NOT count
    // (it encodes the label). Both features read one shared window
    // frame — rows (UNBOUNDED PRECEDING, 1 PRECEDING) under the total
    // order (ts, kind, event_id) with labels sorted FIRST within an
    // instant, so a row's frame is exactly the events at ts strictly
    // less than the label's (same-ts features sort after and stay out).
    // This is q12's union-instead-of-join move generalized: N feature
    // streams and the label stream interleave in ONE sequence, so no
    // per-pair as-of join ever explodes.
    //
    // Scale: one user-keyed exchange + one in-partition sort serves BOTH
    // feature windows (subset rule); adding a feature adds a window
    // function, not a join. The null-before-first-click case surfaces as
    // the -1 sentinel a training pipeline imputes explicitly.
    QueryDef("x102_pit_features",
      """WITH u AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
        |         CASE WHEN event_type = 'click' THEN value END AS click_v,
        |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view,
        |         CASE WHEN event_type = 'purchase' THEN value END AS label_v
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')
        |), w AS (
        |  SELECT user_id, ts, event_type, label_v,
        |         last_value(click_v IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, kind, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS last_click,
        |         CAST(coalesce(sum(is_view) OVER (
        |           PARTITION BY user_id ORDER BY ts, kind, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS n_views_before
        |  FROM u
        |)
        |SELECT user_id, epoch_us(ts) AS label_us,
        |       round(1e-9 + label_v, 4) AS label_value,
        |       round(1e-9 + coalesce(last_click, -1.0), 4) AS last_click_value,
        |       n_views_before
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY user_id, label_us""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("kind"),
          when(col("event_type") === "click", col("value")).as("click_v"),
          when(col("event_type") === "view", 1).otherwise(0).as("is_view"),
          when(col("event_type") === "purchase", col("value")).as("label_v"))
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      u.withColumn("last_click", last(col("click_v"), ignoreNulls = true)
          .over(frame))
        .withColumn("n_views_before",
          coalesce(sum(col("is_view")).over(frame), lit(0)).cast("long"))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("label_us"),
          Num.roundOut(col("label_v"), 4).as("label_value"),
          Num.roundOut(coalesce(col("last_click"), lit(-1.0)), 4)
            .as("last_click_value"),
          col("n_views_before"))
        .orderBy(col("user_id"), col("label_us"))
    },

    // CONVERSION-LATENCY HISTOGRAM — the attribution-window tuning table:
    // per purchase, the time since the user's last click STRICTLY before
    // it (x102's no-leak frame), bucketed by floor-log2 of the latency in
    // seconds (x80's powers-of-two greatest-lower-bound join — integer
    // bucketing, no libm), with the cumulative capture fraction per
    // bucket. The cum_frac column answers the question attribution
    // systems actually ask: "what window captures X% of conversions" —
    // read the first bucket whose cumulative share clears the target.
    //
    // Scale: one user-keyed window exchange (shared shape with x102);
    // latencies collapse to distinct-second counts BEFORE the pow2 join
    // (the join runs on distinct values, not events); the histogram and
    // its cumulative window are O(log max-latency) rows forever.
    QueryDef("x103_conversion_latency",
      s"""WITH u AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
        |         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_us
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), w AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS p_us,
        |         last_value(c_us IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, kind, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS last_c
        |  FROM u
        |), l AS (
        |  SELECT (p_us - last_c) // 1000000 AS lat_s
        |  FROM w WHERE event_type = 'purchase' AND last_c IS NOT NULL
        |), c0 AS (
        |  SELECT lat_s, CAST(count(*) AS BIGINT) AS n FROM l GROUP BY 1
        |), p2(k, v) AS (
        |  VALUES ${TextAnalysis.pow2ValuesSql}
        |), b AS (
        |  SELECT c0.lat_s, max(p2.k) AS bucket
        |  FROM c0 JOIN p2 ON p2.v <= c0.lat_s + 1 GROUP BY c0.lat_s
        |), agg AS (
        |  SELECT b.bucket, CAST(sum(c0.n) AS BIGINT) AS n,
        |         CAST(min(b.lat_s) AS BIGINT) AS min_lat_s,
        |         CAST(max(b.lat_s) AS BIGINT) AS max_lat_s
        |  FROM b JOIN c0 USING (lat_s) GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS tot FROM agg
        |)
        |SELECT CAST(bucket AS INT) AS bucket, n, min_lat_s, max_lat_s,
        |       round(1e-9 + sum(n) OVER (ORDER BY bucket) * 1.0 / t.tot, 4)
        |         AS cum_frac
        |FROM agg, t ORDER BY bucket""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("kind"),
          when(col("event_type") === "click", unix_micros(col("ts")))
            .as("c_us"))
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val l = u
        .withColumn("last_c", last(col("c_us"), ignoreNulls = true).over(frame))
        .filter(col("event_type") === "purchase" && col("last_c").isNotNull)
        .select(expr("(unix_micros(ts) - last_c) div 1000000").as("lat_s"))
      val c0 = l.groupBy(col("lat_s")).agg(count(lit(1)).as("n"))
      import s.implicits._
      val p2 = broadcast(TextAnalysis.pow2Table.toDF("k", "v"))
      val b = c0.select(col("lat_s"))
        .join(p2, col("v") <= col("lat_s") + 1)
        .groupBy(col("lat_s")).agg(max(col("k")).as("bucket"))
      val agg = c0.join(b, "lat_s")
        .groupBy(col("bucket"))
        .agg(sum(col("n")).as("n"),
          min(col("lat_s")).as("min_lat_s"), max(col("lat_s")).as("max_lat_s"))
      val t = agg.agg(sum(col("n")).as("tot"))
      agg.withColumn("cum",
          sum(col("n")).over(Window.orderBy(col("bucket"))))
        .crossJoin(broadcast(t))
        .select(col("bucket").cast("int").as("bucket"), col("n"),
          col("min_lat_s"), col("max_lat_s"),
          Num.roundOut(col("cum") * 1.0 / col("tot"), 4).as("cum_frac"))
        .orderBy(col("bucket"))
    },

    // CHANGE-POINT DETECTION over the daily event series — binary
    // segmentation's first split (the data-drift tripwire a training
    // pipeline runs on its ingest volume): for each day d the CUSUM
    // statistic |S_d − (d/n)·S_n| measures how far the cumulative count
    // path strays from the constant-rate line; the argmax is the most
    // likely level-shift point. The statistic stays in INTEGERS by
    // scaling through by n: g_d = |n·S_d − d·S_n| (no division, no
    // float), so both engines agree bit-for-bit; g_n ≡ 0 by the
    // telescoping identity (Round8Spec pins it) and is_peak marks the
    // argmax row(s) directly in the report.
    //
    // Scale: one partial+final daily count over raw events, then every
    // window runs on the DAYS-sized series (a few hundred rows at any
    // corpus scale) — the cumulative sum and global max never see event
    // grain, so the plan is scan + tiny ordered pass regardless of SF.
    QueryDef("x119_changepoint", Analytics.x119OracleSql) { (s, d) =>
      Analytics.changepointReport(
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")))
    },

    // JOIN-KEY SKEW AUDIT — the pre-flight diagnostic a 100 TB join runs
    // BEFORE picking its strategy: the exact key-frequency spectrum of
    // lineitem's part key (for each multiplicity `freq`, how many keys
    // carry it and what fraction of the table rides on them, with the
    // cumulative share read heaviest-first). One glance answers the
    // planning questions: a long high-freq tail says AQE skew splitting
    // or salting, a cum_share knee says how few keys dominate the
    // shuffle, n_keys says whether the build side is broadcastable
    // after filtering. The spectrum is the degree-distribution shape
    // CBO histograms (w11) compress away — this is the uncompressed
    // diagnostic.
    //
    // Scale: per-key counts combine map-side (the probe is itself
    // skew-safe); the spectrum is distinct-multiplicities-sized —
    // bounded by the heaviest key's count, in practice tens of rows —
    // so the ordered cumulative window never sees data scale.
    QueryDef("x123_skew_audit",
      """WITH f AS (
        |  SELECT l_partkey AS k, count(*) AS freq FROM lineitem GROUP BY 1
        |), h AS (
        |  SELECT freq, count(*) AS n_keys,
        |         CAST(freq * count(*) AS BIGINT) AS bucket_rows
        |  FROM f GROUP BY freq
        |), t AS (SELECT CAST(sum(bucket_rows) AS BIGINT) AS total FROM h)
        |SELECT CAST(freq AS BIGINT) AS freq, n_keys, bucket_rows,
        |       round(1e-9 + bucket_rows * 1.0 / t.total, 6) AS row_share,
        |       round(1e-9 + sum(bucket_rows) OVER (ORDER BY freq DESC)
        |             * 1.0 / t.total, 6) AS cum_share_heavy
        |FROM h, t ORDER BY freq DESC""".stripMargin) { (s, d) =>
      val f = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("freq"))
      val h = f.groupBy(col("freq"))
        .agg(count(lit(1)).as("n_keys"),
          (col("freq") * count(lit(1))).as("bucket_rows"))
      val t = h.agg(sum(col("bucket_rows")).as("total"))
      h.crossJoin(broadcast(t))
        .withColumn("cum", sum(col("bucket_rows")).over(
          Window.orderBy(col("freq").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("freq"), col("n_keys"), col("bucket_rows"),
          Num.roundOut(col("bucket_rows") * 1.0 / col("total"), 6)
            .as("row_share"),
          Num.roundOut(col("cum") * 1.0 / col("total"), 6)
            .as("cum_share_heavy"))
        .orderBy(col("freq").desc)
    },

    // GROUPED VALUE LEADERBOARD — top-3 users per event type by total
    // spend, the serving-table shape behind every "top accounts" panel.
    // Values quantize to milli-units per event BEFORE summing (st17's
    // rule), so the ledger is pure integers and st18 can maintain the
    // SAME state over a live stream: [[userValueState]] builds the
    // ledger, [[valueTopK]] finishes it, and both the batch and
    // streaming paths call those two functions — plus this oracle —
    // verbatim.
    //
    // Scale: the ledger aggregate combines map-side and is bounded by
    // (event_types × active users), not events; the rank window
    // partitions by event_type over ledger rows only. A skewed type's
    // ledger partition is users-sized — if that ever dominates, the
    // per-partition pre-prune of q88's native top-k operator is the
    // drop-in (same contract, heap-bounded partials).
    QueryDef("x125_value_topk", Analytics.x125OracleSql) { (s, d) =>
      Analytics.valueTopK(Analytics.userValueState(Tables.events(s, d)))
    },

    // SAMPLE-RATIO-MISMATCH CHECK — the validity gate that must pass
    // BEFORE anyone reads x111's Welch-z: if the 50/50 assignment
    // (user_id parity, x111's arms) didn't actually produce balanced
    // DISTINCT-user counts per experiment surface, the readout is void
    // (Fabijan et al., KDD'19: SRM is the most common silent A/B
    // corruption). One-cell chi-square against the expected even split,
    // kept in MILLI-units of pure integers — χ²·1000 = 1000·(n_a−n_b)²
    // div (n_a+n_b), flagged at the 0.05 critical value 3.841 — so both
    // engines agree bit-for-bit with no float math at all.
    //
    // Scale: a distinct (event_type, user, arm) projection (map-side
    // combine on the natural keys) then an event-types-sized aggregate —
    // nothing after the distinct sees event grain.
    QueryDef("x127_srm_check", Analytics.x127OracleSql) { (s, d) =>
      Analytics.srmReadout(
        Tables.events(s, d).select(col("event_type"), col("user_id")).distinct())
    },

    // WEEKDAY-SEASONAL ANOMALY DETECTION — x119 finds the single level
    // shift; this finds the day-grain OUTLIERS after removing the weekly
    // seasonality every event stream has (weekend dips would otherwise
    // drown real incidents): expected(day) = the weekday's mean count,
    // residual = actual − expected, and a day flags when its |residual|
    // exceeds 3× the MAD of all residuals (x94's robust-threshold rule
    // applied to the deseasonalized series). Everything stays in MILLI
    // integers (means by integer division) except the MAD median — an
    // average of two integers, exactly representable — so both engines
    // flag identically. Weekday is computed engine-neutrally as
    // days-since-epoch mod 7 (no dayofweek() convention mismatch;
    // 1970-01-01 was a Thursday → wd 0 = Thursday).
    //
    // Scale: one daily count pass over raw events; the seasonal means,
    // residuals, and MAD all run on the days-sized series.
    QueryDef("x134_seasonal_anomaly",
      """WITH dc AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1
        |), wd AS (
        |  SELECT day, cnt,
        |         CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS wd
        |  FROM dc
        |), se AS (
        |  SELECT wd, CAST((1000 * sum(cnt)) // count(*) AS BIGINT)
        |           AS expected_milli
        |  FROM wd GROUP BY wd
        |), res AS (
        |  SELECT wd.day, wd.wd, wd.cnt, se.expected_milli,
        |         1000 * wd.cnt - se.expected_milli AS residual_milli
        |  FROM wd JOIN se USING (wd)
        |), mad AS (
        |  SELECT median(abs(residual_milli)) AS mad FROM res
        |)
        |SELECT day, CAST(wd AS INT) AS wd, cnt, expected_milli,
        |       CAST(residual_milli AS BIGINT) AS residual_milli,
        |       abs(residual_milli) > 3 * mad.mad AS is_anomaly
        |FROM res, mad ORDER BY day""".stripMargin) { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val wd = dc.withColumn("wd",
        pmod(datediff(col("day"), lit("1970-01-01")).cast("long"), lit(7L)))
      val ex = wd.groupBy(col("wd"))
        .agg(expr("(1000 * sum(cnt)) div count(1)").as("expected_milli"))
      val res = wd.join(broadcast(ex), "wd")
        .withColumn("residual_milli",
          lit(1000) * col("cnt") - col("expected_milli"))
      val mad = res.agg(median(abs(col("residual_milli"))).as("mad"))
      res.crossJoin(broadcast(mad))
        .select(col("day"), col("wd").cast("int").as("wd"), col("cnt"),
          col("expected_milli"), col("residual_milli"),
          (abs(col("residual_milli")) > lit(3) * col("mad")).as("is_anomaly"))
        .orderBy(col("day"))
    },

    // WATERMARK LATENESS AUDIT — the sizing table consulted BEFORE
    // choosing a streaming watermark (st04/st05's delay thresholds are
    // exactly this knob): replay the event log in arrival order and
    // measure each event's lateness against the running max event-time
    // (how far behind the frontier it arrived), bucketed into the delay
    // bands a watermark policy would drop at. The fixture's log is
    // perfectly ordered, so a deterministic 1-in-17 slice is replayed
    // 293 sequence positions late (the synthesized-drift convention of
    // x37's graph) — the cumulative share column then reads directly as
    // "data kept under a watermark at this band's edge".
    //
    // Scale: the running max is a DISTRIBUTED PREFIX SCAN — x118's
    // two-pass rank generalized from sum to max: partition by an
    // order-preserving range bucket of the arrival key, take a local
    // running max per partition, and carry the exclusive running max of
    // the per-bucket maxima (a buckets-sized window) across — no
    // single-partition sort over events; the report is 5 rows.
    QueryDef("x136_lateness_audit",
      """WITH a AS (
        |  SELECT event_id, ts,
        |         event_id + CASE WHEN event_id % 17 = 3
        |                         THEN 293 ELSE 0 END AS akey
        |  FROM events
        |), pm AS (
        |  SELECT event_id, ts,
        |         max(ts) OVER (ORDER BY akey, event_id) AS frontier
        |  FROM a
        |), lat AS (
        |  SELECT (epoch_us(frontier) - epoch_us(ts)) // 1000000 AS late_s
        |  FROM pm
        |), b AS (
        |  SELECT CASE WHEN late_s = 0 THEN 0
        |              WHEN late_s <= 3600 THEN 1
        |              WHEN late_s <= 21600 THEN 2
        |              WHEN late_s <= 86400 THEN 3
        |              ELSE 4 END AS bucket_id,
        |         CASE WHEN late_s = 0 THEN 'on_time'
        |              WHEN late_s <= 3600 THEN 'le_1h'
        |              WHEN late_s <= 21600 THEN 'le_6h'
        |              WHEN late_s <= 86400 THEN 'le_24h'
        |              ELSE 'gt_24h' END AS band
        |  FROM lat
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
        |SELECT CAST(bucket_id AS INT) AS bucket_id, band,
        |       count(*) AS n_events,
        |       round(1e-9 + count(*) * 1.0 / t.n, 6) AS share,
        |       round(1e-9 + CAST(sum(count(*)) OVER (ORDER BY bucket_id)
        |             AS BIGINT) * 1.0 / t.n, 6) AS kept_under_edge
        |FROM b, t GROUP BY bucket_id, band, t.n
        |ORDER BY bucket_id""".stripMargin) { (s, d) =>
      val a = Tables.events(s, d)
        .select(col("event_id"), col("ts"),
          (col("event_id") + when(col("event_id") % 17 === 3, 293L)
            .otherwise(0L)).as("akey"))
        .withColumn("bkt", expr("akey div 4096"))
      // distributed prefix max: local running max within the
      // order-preserving range bucket + exclusive carry of bucket maxima
      val local = a.withColumn("lmax", max(col("ts")).over(
        Window.partitionBy(col("bkt")).orderBy(col("akey"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val carry = a.groupBy(col("bkt")).agg(max(col("ts")).as("bmax"))
        .withColumn("carry", max(col("bmax")).over(
          Window.orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("bkt"), col("carry"))
      val lat = local.join(broadcast(carry), "bkt")
        .withColumn("frontier", greatest(col("lmax"),
          coalesce(col("carry"), col("lmax"))))
        .select(expr(
          "(unix_micros(frontier) - unix_micros(ts)) div 1000000").as("late_s"))
      val b = lat.select(
        when(col("late_s") === 0, 0).when(col("late_s") <= 3600, 1)
          .when(col("late_s") <= 21600, 2).when(col("late_s") <= 86400, 3)
          .otherwise(4).cast("int").as("bucket_id"),
        when(col("late_s") === 0, "on_time").when(col("late_s") <= 3600, "le_1h")
          .when(col("late_s") <= 21600, "le_6h")
          .when(col("late_s") <= 86400, "le_24h")
          .otherwise("gt_24h").as("band"))
      val t = b.agg(count(lit(1)).as("n"))
      b.groupBy(col("bucket_id"), col("band"))
        .agg(count(lit(1)).as("n_events"))
        .crossJoin(broadcast(t))
        .withColumn("cum", sum(col("n_events")).over(
          Window.orderBy(col("bucket_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("bucket_id"), col("band"), col("n_events"),
          Num.roundOut(col("n_events") * 1.0 / col("n"), 6).as("share"),
          Num.roundOut(col("cum") * 1.0 / col("n"), 6).as("kept_under_edge"))
        .orderBy(col("bucket_id"))
    },

    // INTER-EVENT GAP HISTOGRAM — the evidence behind q34/st05's
    // 30-minute session threshold (x136's "measure the knob" protocol
    // applied to sessionization): per user, the gap to the previous
    // event, bucketed into the bands a session cut would act on. A
    // valley around the chosen threshold is what justifies it; the
    // sessions_if_cut_here column says directly how many sessions each
    // candidate threshold would create (gaps > edge + one opening
    // session per user), so the knob is read off the table instead of
    // folklore.
    //
    // Scale: the lag window partitions by user_id — the natural
    // high-cardinality event-data partitioner, no global sort anywhere;
    // the histogram is bands-sized.
    QueryDef("x139_gap_histogram",
      """WITH g AS (
        |  SELECT user_id,
        |         (epoch_us(ts) - epoch_us(lag(ts) OVER (
        |            PARTITION BY user_id ORDER BY ts, event_id)))
        |           // 1000000 AS gap_s
        |  FROM events
        |), ng AS (
        |  SELECT gap_s FROM g WHERE gap_s IS NOT NULL
        |), nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u
        |          FROM events),
        |b AS (
        |  SELECT CASE WHEN gap_s <= 60 THEN 0
        |              WHEN gap_s <= 300 THEN 1
        |              WHEN gap_s <= 1800 THEN 2
        |              WHEN gap_s <= 7200 THEN 3
        |              ELSE 4 END AS bucket_id,
        |         CASE WHEN gap_s <= 60 THEN 'le_1m'
        |              WHEN gap_s <= 300 THEN 'le_5m'
        |              WHEN gap_s <= 1800 THEN 'le_30m'
        |              WHEN gap_s <= 7200 THEN 'le_2h'
        |              ELSE 'gt_2h' END AS band
        |  FROM ng
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
        |SELECT CAST(bucket_id AS INT) AS bucket_id, band,
        |       count(*) AS n_gaps,
        |       round(1e-9 + count(*) * 1.0 / t.n, 6) AS share,
        |       CAST(t.n - sum(count(*)) OVER (ORDER BY bucket_id) + nu.u
        |            AS BIGINT) AS sessions_if_cut_here
        |FROM b, t, nu GROUP BY bucket_id, band, t.n, nu.u
        |ORDER BY bucket_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val g = ev.select(col("user_id"), col("ts"),
          lag(col("ts"), 1).over(Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))).as("prev"))
        .filter(col("prev").isNotNull)
        .select(expr("(unix_micros(ts) - unix_micros(prev)) div 1000000")
          .as("gap_s"))
      val b = g.select(
        when(col("gap_s") <= 60, 0).when(col("gap_s") <= 300, 1)
          .when(col("gap_s") <= 1800, 2).when(col("gap_s") <= 7200, 3)
          .otherwise(4).cast("int").as("bucket_id"),
        when(col("gap_s") <= 60, "le_1m").when(col("gap_s") <= 300, "le_5m")
          .when(col("gap_s") <= 1800, "le_30m")
          .when(col("gap_s") <= 7200, "le_2h")
          .otherwise("gt_2h").as("band"))
      val t = b.agg(count(lit(1)).as("n"))
      val nu = ev.agg(countDistinct(col("user_id")).as("u"))
      b.groupBy(col("bucket_id"), col("band"))
        .agg(count(lit(1)).as("n_gaps"))
        .crossJoin(broadcast(t)).crossJoin(broadcast(nu))
        .withColumn("cum", sum(col("n_gaps")).over(
          Window.orderBy(col("bucket_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("bucket_id"), col("band"), col("n_gaps"),
          Num.roundOut(col("n_gaps") * 1.0 / col("n"), 6).as("share"),
          (col("n") - col("cum") + col("u")).as("sessions_if_cut_here"))
        .orderBy(col("bucket_id"))
    },

    // KOLMOGOROV–SMIRNOV SOURCE DRIFT — the distribution-shape test the
    // rank-sum AUC (x142) doesn't give: for every source, the exact
    // two-sample KS statistic between its doc-length distribution and
    // the pooled rest of the corpus, with the length at which the ECDF
    // gap peaks and the α=0.05 reject flag (critical value
    // 1.358·√(n/(n_s·(n−n_s)))). The ingest-time tripwire for "this
    // source changed its chunking".
    //
    // Exactness: ECDFs are ppm-quantized integers (cum·10⁶ div n — one
    // integer division, no float cumsum), so the max-gap argmax is an
    // exact-integer order both engines share; the only FP ops are the
    // final critical-value compare (identical literal→sqrt→compare
    // sequence on identical longs). cum·10⁶ stays inside a long up to
    // 9·10¹² docs — past that the ppm quantization itself would switch
    // to div-then-scale (same designed-output discipline as x142's
    // BIGINT note).
    //
    // Scale: the corpus collapses map-side to (source × length-domain)
    // counts; the dense grid, per-source cumulatives, and the argmax
    // windows all run on that sources×domain table — every window here
    // is PARTITIONED by source over the value domain, and the pooled
    // cumulative comes from a grid aggregation, not a global window.
    QueryDef("x156_ks_source_drift", Analytics.x156OracleSql) { (s, d) =>
      ksReport(lengthEcdfGrid(s, d))
    },

    // MARKOV STATIONARY DISTRIBUTION — the long-run occupancy of the
    // x95 transition matrix (where user journeys SETTLE, not just what
    // follows what): π ← πP iterated 8 unrolled rounds from the uniform
    // start, with x160's per-round rounding parity (each π component
    // rounds to 6 before the next multiply, so both engines walk the
    // identical float sequence) and the final L1 step-delta reported as
    // the convergence audit. Event types that never appear as a
    // successor drop out of π by round one — the absorbing-source
    // semantics a journey model wants surfaced, not smoothed away.
    //
    // Scale: π and P live on types-sized tables (≤ 25 cells at any
    // corpus size); the single corpus-touching pass is x95's shared
    // lead() spine (one user-keyed exchange). Eight rounds of
    // broadcast-join arithmetic on ≤5-row tables cost nothing and the
    // round count is FIXED — no convergence loop.
    QueryDef("x162_markov_stationary",
      {
        val rounds = (1 to 8).map { j =>
          s"""pi$j AS (
            |  SELECT c.to_type AS t,
            |         round(1e-9 + sum(pi.p * c.n / rs.tot), 6) AS p
            |  FROM c JOIN pi${j - 1} pi ON pi.t = c.from_type
            |  JOIN rs ON rs.from_type = c.from_type
            |  GROUP BY 1
            |)""".stripMargin
        }.mkString(", ")
        s"""WITH $transCteSql, rs AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
        |), k AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k FROM rs
        |), pi0 AS (
        |  SELECT from_type AS t, CAST(1.0 AS DOUBLE) / k AS p
        |  FROM rs CROSS JOIN k
        |), $rounds, dl AS (
        |  SELECT round(1e-9 + sum(abs(a.p - b.p)), 6) AS l1_delta
        |  FROM pi8 a JOIN pi7 b ON b.t = a.t
        |)
        |SELECT a.t AS event_type, a.p AS stationary,
        |       rs.tot AS n_out, dl.l1_delta
        |FROM pi8 a
        |JOIN rs ON rs.from_type = a.t
        |CROSS JOIN dl
        |ORDER BY event_type""".stripMargin
      }) { (s, d) =>
      val c = transCounts(s, d).localCheckpoint() // ≤25 rows; 8 rounds read it
      val rs = c.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
      val k = rs.agg(count(lit(1)).as("k"))
      var pi = rs.crossJoin(broadcast(k))
        .select(col("from_type").as("t"),
          (lit(1.0).cast("double") / col("k")).as("p"))
      var prev = pi
      (1 to 8).foreach { _ =>
        prev = pi
        pi = c.join(broadcast(pi), col("t") === col("from_type"))
          .join(broadcast(rs.withColumnRenamed("from_type", "rf")),
            col("rf") === col("from_type"))
          .groupBy(col("to_type"))
          .agg(Num.roundOut(sum(col("p") * col("n") / col("tot")), 6)
            .as("p"))
          .withColumnRenamed("to_type", "t")
          .localCheckpoint() // ≤5 rows; severs the 8-round lineage
      }
      val dl = pi.select(col("t"), col("p"))
        .join(prev.select(col("t"), col("p").as("pp")), "t")
        .agg(Num.roundOut(sum(abs(col("p") - col("pp"))), 6).as("l1_delta"))
      pi.join(broadcast(rs.withColumnRenamed("from_type", "t")), "t")
        .crossJoin(broadcast(dl))
        .select(col("t").as("event_type"), col("p").as("stationary"),
          col("tot").as("n_out"), col("l1_delta"))
        .orderBy(col("event_type"))
    },

    // 1-WASSERSTEIN SOURCE DRIFT — the MAGNITUDE test completing the
    // drift toolkit (x156 KS = worst-case ECDF gap, x157 JSD = word
    // choice, this = HOW MANY CHARACTERS of mass must move): W1 between
    // each source's length distribution and the pooled rest, as the
    // exact area between the ppm ECDFs (Σ |F_s − F_r|·Δv over the
    // length domain), plus both quantized means — for 1-D
    // distributions W1 collapses to |Δmean| exactly when one side
    // stochastically dominates, so w1 ≫ |Δmean| localizes
    // crossing-shape drift that a mean monitor would miss entirely.
    // All integers: Σ g·Δv ≤ 10⁶ · length-range, exact at any corpus
    // size.
    //
    // Scale: reads the same source×domain ECDF grid as x156 (one
    // definition); the Δv lead() window is partitioned by source over
    // the value domain. Nothing here touches the corpus beyond the
    // grid's map-side count pass.
    QueryDef("x165_wasserstein_drift",
      s"""WITH $lengthGridCteSql, g AS (
        |  SELECT source, n_s, v, n,
        |         abs(cum_s * 1000000 // n_s
        |           - (cum_all - cum_s) * 1000000 // (n - n_s)) AS g,
        |         lead(v) OVER (PARTITION BY source ORDER BY v) - v AS dv
        |  FROM gb
        |), w AS (
        |  SELECT source, n_s, n,
        |         CAST(sum(CASE WHEN dv IS NULL THEN 0 ELSE g * dv END)
        |              AS BIGINT) AS w1_ppm_chars
        |  FROM g GROUP BY 1, 2, 3
        |), mn AS (
        |  SELECT source,
        |         CAST(sum(CASE WHEN c > 0 THEN v * c ELSE 0 END) AS BIGINT)
        |           AS sv
        |  FROM cnt GROUP BY 1
        |), ms AS (
        |  SELECT m.source, m.sv, t.sa FROM mn m CROSS JOIN
        |    (SELECT CAST(sum(sv) AS BIGINT) AS sa FROM mn) t
        |)
        |SELECT w.source, w.n_s AS n_docs,
        |       CAST(w1_ppm_chars // 1000 AS BIGINT) AS w1_milli_chars,
        |       CAST(ms.sv * 1000 // w.n_s AS BIGINT) AS mean_s_milli,
        |       CAST((ms.sa - ms.sv) * 1000 // (w.n - w.n_s) AS BIGINT)
        |         AS mean_rest_milli
        |FROM w JOIN ms ON ms.source = w.source
        |ORDER BY w.source""".stripMargin) { (s, d) =>
      val gb = lengthEcdfGrid(s, d).localCheckpoint() // W1 + means read it
      val g = gb.select(col("source"), col("n_s"), col("v"), col("n"),
          abs(expr("cum_s * 1000000 div n_s")
            - expr("(cum_all - cum_s) * 1000000 div (n - n_s)")).as("g"))
        .withColumn("dv", lead(col("v"), 1).over(
          Window.partitionBy(col("source")).orderBy(col("v"))) - col("v"))
      val w = g.groupBy(col("source"), col("n_s"), col("n"))
        .agg(sum(when(col("dv").isNull, 0L)
          .otherwise(col("g") * col("dv"))).as("w1_ppm_chars"))
      // per-(source, v) counts recovered from the cumulative grid: the
      // first derivative of cum_s along the domain
      val cnts = gb.withColumn("pc", lag(col("cum_s"), 1, 0).over(
          Window.partitionBy(col("source")).orderBy(col("v"))))
        .select(col("source"), col("v"), (col("cum_s") - col("pc")).as("c"))
      val mn = cnts.groupBy(col("source"))
        .agg(sum(when(col("c") > 0, col("v") * col("c")).otherwise(0L))
          .as("sv"))
      val sa = mn.agg(sum(col("sv")).as("sa"))
      w.join(mn, "source").crossJoin(broadcast(sa))
        .select(col("source"), col("n_s").as("n_docs"),
          expr("w1_ppm_chars div 1000").as("w1_milli_chars"),
          expr("sv * 1000 div n_s").as("mean_s_milli"),
          expr("(sa - sv) * 1000 div (n - n_s)").as("mean_rest_milli"))
        .orderBy(col("source"))
    },

    // DAILY-SERIES AUTOCORRELATION — the periodicity probe the
    // change-point (q78/st13) and EWMA (x151) monitors don't give: ACF
    // of the daily event-count series at lags 1..7 (is there a weekly
    // rhythm the forecaster must model?). Lags come from a calendar
    // SELF-JOIN on day+k — no window at all — and the estimator is the
    // n²-scaled exact form: N_k = Σ(n·x_t − S)(n·x_{t+k} − S) over
    // aligned pairs with the SAME anchoring for the variance term, so
    // r_k = N_k/D is one float division of exact longs (bound: n·x
    // products stay in int64 to ~3·10⁹ events/day on a 10⁴-day
    // calendar — x142's overflow discipline notes the DOUBLE fallback
    // past that).
    //
    // Scale: the corpus collapses map-side to the days-bounded series;
    // the lag join, moments, and report are all calendar-sized. The
    // denominator anchors on the full-series mean (the standard ACF
    // normalization), computed once and broadcast.
    QueryDef("x173_daily_acf",
      """WITH ds AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1
        |), mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
        |  FROM ds
        |), den AS (
        |  SELECT CAST(sum((mo.n * ds.x - mo.s) * (mo.n * ds.x - mo.s))
        |              AS BIGINT) AS d0
        |  FROM ds CROSS JOIN mo
        |), lags AS (
        |  SELECT CAST(r.range AS INT) AS lag FROM range(1, 8) r
        |), pairs AS (
        |  SELECT l.lag,
        |         CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum((mo.n * a.x - mo.s) * (mo.n * b.x - mo.s))
        |              AS BIGINT) AS nk
        |  FROM lags l
        |  JOIN ds a ON true
        |  JOIN ds b ON b.day = a.day + l.lag
        |  CROSS JOIN mo
        |  GROUP BY 1
        |)
        |SELECT p.lag, p.n_pairs,
        |       round(1e-9 + p.nk * 1.0 / den.d0, 6) AS acf
        |FROM pairs p CROSS JOIN den ORDER BY p.lag""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint() // days-bounded; moments + both join sides
      val mo = ds.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      val den = ds.crossJoin(broadcast(mo))
        .agg(sum((col("n") * col("x") - col("s"))
          * (col("n") * col("x") - col("s"))).as("d0"))
      val lags = (1 to 7).toDF("lag")
      val pairs = broadcast(lags)
        .join(ds.select(col("day").as("da"), col("x").as("xa")), lit(true))
        .join(ds.select(col("day").as("db"), col("x").as("xb")),
          expr("db = date_add(da, lag)"))
        .crossJoin(broadcast(mo))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("n") * col("xa") - col("s"))
            * (col("n") * col("xb") - col("s"))).as("nk"))
      pairs.crossJoin(broadcast(den))
        .select(col("lag"), col("n_pairs"),
          Num.roundOut(col("nk") * 1.0 / col("d0"), 6).as("acf"))
        .orderBy(col("lag"))
    },

    // MANN–WHITNEY U per source — the LOCATION-shift drift test beside
    // x156's sup-norm KS and x165's W1, on the SAME length-ECDF grid
    // (one distribution definition for all three): does source s's
    // length distribution sit systematically above or below the pooled
    // rest? The rank-sum collapses to the value domain exactly like
    // x142's AUC: 2U = Σ_v c_s·(2·rest_below + rest_at) — integer sums
    // off the shared grid (2U ≤ 2·n_s·n_rest stays in int64 to ~3·10⁹
    // docs; the x142 DOUBLE fallback past that). The z-score carries
    // the full tie correction Σ(t³−t) over pooled value counts (t³ sums
    // bound: int64 until one length value alone holds ~2·10⁶ docs —
    // then the same DOUBLE fallback), and the rank-biserial effect size
    // 2U/(n₁n₂)−1 rides along. Degenerate single-source corpus and
    // zero-variance (all-one-length) corpus report NULL by design (the
    // x142 guarded-division rule).
    //
    // Scale: the corpus pass is lens' map-side (source, length) count;
    // everything after runs on the sources × length-domain grid. All
    // windows are PARTITIONED by source.
    QueryDef("x178_mann_whitney",
      s"""WITH $lengthGridCteSql, dc AS (
        |  SELECT source, n_s, v, n, cum_s, cum_all,
        |         cum_s - COALESCE(lag(cum_s) OVER (
        |           PARTITION BY source ORDER BY v), 0) AS cs,
        |         cum_all - COALESCE(lag(cum_all) OVER (
        |           PARTITION BY source ORDER BY v), 0) AS call
        |  FROM gb
        |), u AS (
        |  SELECT source, n_s, n,
        |         CAST(sum(cs * (2 * ((cum_all - call) - (cum_s - cs))
        |                        + (call - cs))) AS BIGINT) AS u2
        |  FROM dc GROUP BY 1, 2, 3
        |), t AS (
        |  SELECT CAST(sum(call * call * call - call) AS BIGINT) AS ties
        |  FROM (SELECT v, max(call) AS call FROM dc GROUP BY v)
        |)
        |SELECT u.source, u.n_s AS n_docs, u.u2,
        |       CASE WHEN u.n = u.n_s THEN NULL
        |            ELSE round(1e-9 + u.u2 * 1.0 / (u.n_s * (u.n - u.n_s))
        |                       - 1, 6)
        |       END AS rank_biserial,
        |       CASE WHEN u.n = u.n_s
        |              OR (u.n + 1) - t.ties * 1.0 / (u.n * (u.n - 1.0)) = 0
        |            THEN NULL
        |            ELSE round(1e-9 +
        |              (u.u2 / 2.0 - u.n_s * (u.n - u.n_s) / 2.0)
        |              / sqrt(u.n_s * 1.0 * (u.n - u.n_s) / 12.0
        |                * ((u.n + 1) - t.ties * 1.0
        |                   / (u.n * (u.n - 1.0)))), 4)
        |       END AS z
        |FROM u CROSS JOIN t ORDER BY u.source""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("source")).orderBy(col("v"))
      val dc = lengthEcdfGrid(s, d)
        .withColumn("cs",
          col("cum_s") - coalesce(lag(col("cum_s"), 1).over(w), lit(0L)))
        .withColumn("call",
          col("cum_all") - coalesce(lag(col("cum_all"), 1).over(w), lit(0L)))
        .localCheckpoint() // grid-sized; U rollup + tie scan read it
      val u = dc.groupBy(col("source"), col("n_s"), col("n"))
        .agg(sum(col("cs") * (lit(2) * ((col("cum_all") - col("call"))
          - (col("cum_s") - col("cs"))) + (col("call") - col("cs"))))
          .as("u2"))
      val t = dc.groupBy(col("v")).agg(max(col("call")).as("call"))
        .agg(sum(col("call") * col("call") * col("call") - col("call"))
          .as("ties"))
      u.crossJoin(broadcast(t))
        .select(col("source"), col("n_s").as("n_docs"), col("u2"),
          when(col("n") === col("n_s"), lit(null).cast("double"))
            .otherwise(Num.roundOut(col("u2") * 1.0
              / (col("n_s") * (col("n") - col("n_s"))) - 1, 6))
            .as("rank_biserial"),
          when(col("n") === col("n_s") ||
              (col("n") + 1) - col("ties") * 1.0
                / (col("n") * (col("n") - 1.0)) === 0.0,
            lit(null).cast("double"))
            .otherwise(Num.roundOut(
              (col("u2") / 2.0 - col("n_s") * (col("n") - col("n_s")) / 2.0)
                / sqrt(col("n_s") * 1.0 * (col("n") - col("n_s")) / 12.0
                  * ((col("n") + 1) - col("ties") * 1.0
                    / (col("n") * (col("n") - 1.0)))), 4))
            .as("z"))
        .orderBy(col("source"))
    },

    // QQ DRIFT PROFILE per source — the DIRECTION-resolved view the
    // scalar drift tests (x156 KS, x165 W1, x178 MW) summarize away:
    // each source's exact length deciles aligned against the pooled
    // corpus deciles, as gap and milli-ratio columns. Quantiles are
    // EXACT rank selections on the shared ECDF grid — min v with
    // 10·cum ≥ level·n, a pure integer predicate, so the whole profile
    // is deterministic cross-engine with no interpolation convention to
    // match. Fifth consumer of the one grid definition: all five drift
    // views provably test the same distribution.
    //
    // Scale: the corpus pass is lens' map-side count (shared, usually
    // already warm); the decile probes are grid × 9 predicate
    // evaluations and the report is sources × 9 rows. The selection
    // stage adds NO windows (the grid's own cum_s window is per-source
    // and part of the shared definition) — rank selection is a
    // filtered min, the serving-path quantile shape at 100 TB (x27's
    // lesson); PlanShapeSpec pins the stage window-free.
    QueryDef("x180_qq_drift",
      s"""WITH $lengthGridCteSql, lv AS (
        |  SELECT CAST(r.range AS BIGINT) AS level FROM range(1, 10) r
        |), sq AS (
        |  SELECT gb.source, lv.level, min(gb.v) AS q_src
        |  FROM gb JOIN lv ON gb.cum_s * 10 >= lv.level * gb.n_s
        |  GROUP BY 1, 2
        |), pool AS (
        |  SELECT DISTINCT v, cum_all, n FROM gb
        |), pq AS (
        |  SELECT lv.level, min(pool.v) AS q_all
        |  FROM pool JOIN lv ON pool.cum_all * 10 >= lv.level * pool.n
        |  GROUP BY 1
        |)
        |SELECT sq.source, sq.level, CAST(sq.q_src AS BIGINT) AS q_src,
        |       CAST(pq.q_all AS BIGINT) AS q_all,
        |       CAST(sq.q_src - pq.q_all AS BIGINT) AS gap,
        |       CASE WHEN pq.q_all = 0 THEN NULL
        |            ELSE CAST(sq.q_src * 1000 // pq.q_all AS BIGINT)
        |       END AS ratio_milli
        |FROM sq JOIN pq USING (level)
        |ORDER BY sq.source, sq.level""".stripMargin) { (s, d) =>
      val gb = lengthEcdfGrid(s, d).localCheckpoint() // grid; two probes
      val lv = {
        import s.implicits._
        (1L to 9L).toDF("level")
      }
      val sq = gb.join(broadcast(lv),
          col("cum_s") * 10 >= col("level") * col("n_s"))
        .groupBy(col("source"), col("level"))
        .agg(min(col("v")).as("q_src"))
      val pool = gb.select(col("v"), col("cum_all"), col("n")).distinct()
      val pq = pool.join(broadcast(lv),
          col("cum_all") * 10 >= col("level") * col("n"))
        .groupBy(col("level")).agg(min(col("v")).as("q_all"))
      sq.join(pq, "level")
        .select(col("source"), col("level"), col("q_src"), col("q_all"),
          (col("q_src") - col("q_all")).as("gap"),
          when(col("q_all") === 0, lit(null).cast("long"))
            .otherwise(expr("q_src * 1000 div q_all")).as("ratio_milli"))
        .orderBy(col("source"), col("level"))
    },

    // JOIN-CARDINALITY ESTIMATION AUDIT — the optimizer-statistics step:
    // how well can |click ⋈ view on user_id| be predicted WITHOUT
    // running the join at full width? Three arms on one row:
    //   exact      — Σ_u n_a(u)·n_b(u) over the per-key count tables
    //                (the join never widens past (key, count));
    //   sysr_est   — the System R uniform-containment estimate
    //                n_a·n_b / max(d_a, d_b) (Selinger 1979);
    //   cs_est     — COORDINATED key sampling (join synopses, Acharya
    //                1999): both sides keep the SAME hash-chosen 1/4 of
    //                keys, so sampled pairs actually join; estimate =
    //                4 × the sampled pair mass. Unbiased; relative
    //                error CONTRACTS as keys grow (measured here:
    //                36% → 4% → 1.1% over the three SFs), which is the
    //                regime that matters at 100 TB. Empty sample = the
    //                designed NULL, both engines.
    // Self-join sizes sj_a/sj_b ride along — the skew diagnostic that
    // bounds any sketch estimator's variance (AGMS). All integer-exact.
    //
    // Scale: everything flows from two (key, count) aggregates; no raw
    // row ever joins. The synopsis arm's state is d/4 keys — the
    // bounded-synopsis discipline an optimizer actually ships.
    QueryDef("x189_join_cardinality",
      """WITH a AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events
        |  WHERE event_type = 'click' GROUP BY 1
        |), b AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), ca AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d,
        |         CAST(sum(c * c) AS BIGINT) AS sj FROM a
        |), cb AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d,
        |         CAST(sum(c * c) AS BIGINT) AS sj FROM b
        |), ex AS (
        |  SELECT CAST(sum(a.c * b.c) AS BIGINT) AS exact_pairs
        |  FROM a JOIN b USING (user_id)
        |), cs AS (
        |  SELECT CAST(4 * sum(a.c * b.c) AS BIGINT) AS est
        |  FROM a JOIN b USING (user_id)
        |  WHERE ((user_id * 2654435761 + 12345) % 1000000007) % 4 = 0
        |)
        |SELECT ca.n AS n_a, cb.n AS n_b, ca.d AS d_a, cb.d AS d_b,
        |       ca.sj AS sj_a, cb.sj AS sj_b, ex.exact_pairs,
        |       ca.n * cb.n // greatest(ca.d, cb.d) AS sysr_est,
        |       CASE WHEN ex.exact_pairs IS NULL OR ex.exact_pairs = 0
        |            THEN NULL
        |            ELSE abs(ca.n * cb.n // greatest(ca.d, cb.d)
        |                     - ex.exact_pairs)
        |                 * 1000000 // ex.exact_pairs
        |       END AS sysr_err_ppm,
        |       cs.est AS cs_est,
        |       CASE WHEN cs.est IS NULL OR ex.exact_pairs IS NULL
        |                 OR ex.exact_pairs = 0 THEN NULL
        |            ELSE abs(cs.est - ex.exact_pairs) * 1000000
        |                 // ex.exact_pairs
        |       END AS cs_err_ppm
        |FROM ca, cb, ex, cs""".stripMargin) { (s, d) =>
      def side(t: String) = Tables.events(s, d)
        .filter(col("event_type") === t)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // (key, count) synopsis; read by 3 arms
      val a = side("click"); val b = side("view")
      def stats(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum(col("c")).as("n"),
        count(lit(1)).as("d"), sum(col("c") * col("c")).as("sj"))
      val ex = a.join(b, "user_id")
        .agg(sum(a("c") * b("c")).as("exact_pairs"))
      val cs = a.join(b, "user_id")
        .filter(expr(
          "((user_id * 2654435761 + 12345) % 1000000007) % 4 = 0"))
        .agg((lit(4L) * sum(a("c") * b("c"))).cast("long").as("est"))
      stats(a).toDF("n_a", "d_a", "sj_a")
        .crossJoin(broadcast(stats(b).toDF("n_b", "d_b", "sj_b")))
        .crossJoin(broadcast(ex)).crossJoin(broadcast(cs))
        .select(col("n_a"), col("n_b"), col("d_a"), col("d_b"),
          col("sj_a"), col("sj_b"), col("exact_pairs"),
          expr("n_a * n_b div greatest(d_a, d_b)").as("sysr_est"),
          // BIGINT bound (ADVICE r8/x142 convention): n_a·n_b and the
          // ppm numerators are exact int64 up to ~3·10⁹ rows per side —
          // past that Spark's non-ANSI multiply wraps while DuckDB
          // widens to HUGEINT. At that scale switch the estimate math
          // to a DOUBLE escape arm (x142's auc_dbl pattern); at every
          // tested SF the integer arm is exact. An empty key overlap is
          // a DESIGNED NULL via the same explicit CASE on both engines
          // (ADVICE r10), never an accidental div-by-zero NULL.
          when(col("exact_pairs").isNull || col("exact_pairs") === 0,
            lit(null).cast("long"))
            .otherwise(expr(
              "abs(n_a * n_b div greatest(d_a, d_b) - exact_pairs)" +
              " * 1000000 div exact_pairs")).as("sysr_err_ppm"),
          col("est").as("cs_est"),
          when(col("est").isNull || col("exact_pairs").isNull ||
              col("exact_pairs") === 0, lit(null).cast("long"))
            .otherwise(expr(
              "abs(est - exact_pairs) * 1000000 div exact_pairs"))
            .as("cs_err_ppm"))
    },

    // STRICT ORDERED FUNNEL — the sequence-constrained conversion x153
    // (a filter funnel on documents) and x103 (click→purchase latency,
    // order-free) don't express: users completing click THEN view THEN
    // purchase, each step strictly after the previous AND within 24
    // hours of it. The per-step anchor is the EARLIEST qualifying time
    // (first click; first view after it; first purchase after that) —
    // the standard product-analytics definition, deterministic without
    // tiebreaks because min(ts) is order-free. Degenerate empty steps
    // report the designed NULL, both engines.
    //
    // Scale: three user-keyed aggregates + two user-keyed equi-joins —
    // one shuffle key throughout (user_id, the event table's natural
    // partitioner); each step's anchor table is ≤ users rows; the
    // report is 3 rows. No windows, no pairs.
    QueryDef("x193_strict_funnel",
      """WITH u0 AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'click' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        |  GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL 24 HOUR
        |  GROUP BY 1
        |), c AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM u0) AS n0,
        |         (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
        |         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
        |         (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3
        |)
        |SELECT 1 AS step, 'click' AS event, n1 AS n_users,
        |       CASE WHEN n0 = 0 THEN NULL
        |            ELSE n1 * 1000000 // n0 END AS conv_ppm FROM c
        |UNION ALL SELECT 2, 'view', n2,
        |       CASE WHEN n1 = 0 THEN NULL
        |            ELSE n2 * 1000000 // n1 END FROM c
        |UNION ALL SELECT 3, 'purchase', n3,
        |       CASE WHEN n2 = 0 THEN NULL
        |            ELSE n3 * 1000000 // n2 END FROM c
        |ORDER BY step""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val s1 = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "view").as("e")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").as("e")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 24 HOUR"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val c = ev.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n0"))
        .crossJoin(broadcast(s1.agg(count(lit(1)).as("n1"))))
        .crossJoin(broadcast(s2.agg(count(lit(1)).as("n2"))))
        .crossJoin(broadcast(s3.agg(count(lit(1)).as("n3"))))
      def stepRow(k: Int, ev0: String, n: String, prev: String) =
        c.select(lit(k).as("step"), lit(ev0).as("event"),
          col(n).as("n_users"),
          when(col(prev) === 0, lit(null).cast("long"))
            .otherwise(expr(s"$n * 1000000 div $prev")).as("conv_ppm"))
      stepRow(1, "click", "n1", "n0")
        .unionByName(stepRow(2, "view", "n2", "n1"))
        .unionByName(stepRow(3, "purchase", "n3", "n2"))
        .orderBy(col("step"))
    }
  )

  /** The dense per-source length-ECDF grid — x156 (KS) and x165 (W1)
    * read the same (source, n_s, v, cum_s, cum_all, n) table, so the
    * two drift tests can't disagree about the distribution they test.
    * Every window is PARTITIONED by source over the length-value domain;
    * the pooled cumulative is a grid aggregation. A def (entries
    * initializes first). */
  private def lengthGridCteSql: String =
    """lens AS (
      |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2
      |), vals AS (
      |  SELECT DISTINCT v FROM lens
      |), srcs AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM lens GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n FROM lens
      |), grid AS (
      |  SELECT s.source, s.n_s, va.v FROM srcs s CROSS JOIN vals va
      |), cnt AS (
      |  SELECT g.source, g.n_s, g.v, COALESCE(l.c, 0) AS c
      |  FROM grid g LEFT JOIN lens l ON l.source = g.source AND l.v = g.v
      |), cum AS (
      |  SELECT source, n_s, v,
      |         sum(c) OVER (PARTITION BY source ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
      |  FROM cnt
      |), ca AS (
      |  SELECT v, CAST(sum(cum_s) AS BIGINT) AS cum_all FROM cum GROUP BY v
      |), gb AS (
      |  SELECT cum.source, cum.n_s, cum.v, cum.cum_s, ca.cum_all, tot.n
      |  FROM cum JOIN ca ON ca.v = cum.v CROSS JOIN tot
      |)""".stripMargin

  /** x156's full report SQL — shared with st24's streaming maintenance so
    * the converged drift state answers EXACTLY the batch oracle. */
  private[graft] def x156OracleSql: String =
    s"""WITH $lengthGridCteSql, gap AS (
      |  SELECT source, n_s, v,
      |         abs(cum_s * 1000000 // n_s
      |           - (cum_all - cum_s) * 1000000 // (n - n_s)) AS g,
      |         n
      |  FROM gb
      |), r AS (
      |  SELECT source, n_s, v, g, n, row_number() OVER (
      |    PARTITION BY source ORDER BY g DESC, v) AS rn
      |  FROM gap
      |)
      |SELECT source, n_s AS n_docs, CAST(g AS BIGINT) AS ks_ppm,
      |       CAST(v AS BIGINT) AS ks_at,
      |       CAST(g AS DOUBLE) / CAST(1000000 AS DOUBLE)
      |         > CAST(1.358 AS DOUBLE)
      |           * sqrt(CAST(n AS DOUBLE)
      |                  / (CAST(n_s AS DOUBLE) * CAST(n - n_s AS DOUBLE)))
      |         AS reject
      |FROM r WHERE rn = 1 ORDER BY source""".stripMargin

  /** The ECDF grid → full x156 KS report — shared by the batch entry and
    * st24's converged-stream readout. */
  private[graft] def ksReport(
      grid: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val gap = grid
      .select(col("source"), col("n_s"), col("v"), col("n"),
        abs(expr("cum_s * 1000000 div n_s")
          - expr("(cum_all - cum_s) * 1000000 div (n - n_s)")).as("g"))
    gap.withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("g").desc, col("v"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("n_s").as("n_docs"),
        col("g").as("ks_ppm"), col("v").cast("long").as("ks_at"),
        (col("g").cast("double") / lit(1000000).cast("double")
          > lit(1.358) * sqrt(col("n").cast("double")
            / (col("n_s").cast("double")
               * (col("n") - col("n_s")).cast("double")))).as("reject"))
      .orderBy(col("source"))
  }

  private[graft] def lengthEcdfGrid(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    lengthEcdfGridFrom(Tables.documents(s, d)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c")))

  /** Grid from an ALREADY-AGGREGATED (source, v, c) counts table — the
    * additive state st24 maintains incrementally. */
  private[graft] def lengthEcdfGridFrom(
      lens: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val vals = lens.select(col("v")).distinct()
    val srcs = lens.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val tot = lens.agg(sum(col("c")).as("n"))
    val cum = srcs.crossJoin(broadcast(vals))
      .join(lens, Seq("source", "v"), "left")
      .select(col("source"), col("n_s"), col("v"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum_s", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ca = cum.groupBy(col("v")).agg(sum(col("cum_s")).as("cum_all"))
    cum.join(broadcast(ca), "v").crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"), col("v"), col("cum_s"),
        col("cum_all"), col("n"))
  }

  /** x95's full report SQL — shared with st23's streaming maintenance so
    * the converged stream answers EXACTLY the batch oracle. */
  private[graft] def x95OracleSql: String =
    s"""WITH $transCteSql, t AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
      |)
      |SELECT c.from_type, c.to_type, c.n,
      |       round(1e-9 + c.n * 1.0 / t.tot, 4) AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** x95's successor-pair spine (from_type, to_type, n) as shared DuckDB
    * CTEs and the matching Spark builder — one definition feeding both
    * the transition report (x95), the stationary distribution (x162),
    * and st23's streaming maintenance oracle, so the matrix can't drift
    * between them. A def, not a val: `entries` initializes first (the
    * x69 lnq lesson). */
  private def transCteSql: String =
    """p AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS to_type
      |  FROM events
      |), c AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
      |)""".stripMargin

  /** The (from_type, to_type, n) counts → full x95 report — shared by the
    * batch entry and st23's converged-stream readout. */
  private[graft] def transReport(
      c: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val t = c.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        Num.roundOut(col("n") * 1.0 / col("tot"), 4).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private def transCounts(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
}
