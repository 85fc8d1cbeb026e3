package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Join battery — reference operators J1-J5 (SURVEY.md §2.3).
  *
  * Scale shapes:
  *  - J2 temporal equi join: the daily dimension (one row per day — bounded,
  *    tiny) is BROADCAST so the fact stream never shuffles.
  *  - J3 dimension-preserving count: the fact side is pre-aggregated by key
  *    before joining the dimension — at 100 TB only the per-key partial
  *    aggregates cross the exchange, never raw fact rows. q09 keeps the
  *    literal left-join + count(col) form (broadcast dim probe) to pin the
  *    reference's COUNT(ti.*) null semantics.
  *  - J5 as-of join: implemented as union + last(ignoreNulls) over a
  *    time-ordered window — one shuffle by user, NO pairwise join explosion
  *    (a per-user purchases×clicks theta join would be quadratic in the hot
  *    keys at scale).
  */
object Joins {

  val entries: Seq[QueryDef] = Seq(

    // J2 temporal equi left join on a computed date key
    // (reference: queries.py:60-61, viz.py:110-112).
    QueryDef("q08_temporal_join",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, round(1e-9 + avg(value), 4) AS day_avg
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_id, CAST(e.ts AS DATE) AS day, d.day_avg
        |FROM events e
        |LEFT JOIN daily d ON CAST(e.ts AS DATE) = d.day
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val daily = e.groupBy(to_date(col("ts")).as("day"))
        .agg(Num.roundOut(avg(col("value")), 4).as("day_avg"))
      e.join(broadcast(daily), to_date(col("ts")) === col("day"), "left")
        .select(col("event_id"), to_date(col("ts")).as("day"), col("day_avg"))
        .orderBy(col("event_id"))
    },

    // J3 dimension-preserving outer-count join with COUNT(col) null
    // semantics: every nation appears, unmatched count 0
    // (reference: queries.py:69-77 — COUNT(ti.*) counts matched rows only).
    QueryDef("q09_dim_outer_count",
      """SELECT n.n_name AS nation_name, count(s.s_suppkey) AS n_suppliers
        |FROM nation n
        |LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY nation_name""".stripMargin) { (s, d) =>
      val n = Tables.nation(s, d)
      val sup = Tables.supplier(s, d)
      n.join(sup, sup("s_nationkey") === n("n_nationkey"), "left")
        .groupBy(col("n_name").as("nation_name"))
        .agg(count(col("s_suppkey")).as("n_suppliers"))
        .orderBy(col("nation_name"))
    },

    // J1 range-containment theta join (the ST_Contains point-in-polygon
    // analog, reference queries.py:57-59): inner join with the tiny bucket
    // side broadcast (single pass over facts, the GIST-index analog), empty
    // buckets restored dimension-side.
    QueryDef("q10_size_buckets",
      """WITH buckets AS (
        |  SELECT CAST(range AS INT) AS lo, CAST(range + 10 AS INT) AS hi
        |  FROM range(0, 60, 10)
        |)
        |SELECT b.lo, b.hi, count(p.p_partkey) AS n_parts,
        |       round(1e-9 + avg(p.p_retailprice), 4) AS avg_price
        |FROM buckets b
        |LEFT JOIN part p ON p.p_size >= b.lo AND p.p_size < b.hi
        |GROUP BY b.lo, b.hi ORDER BY b.lo""".stripMargin) { (s, d) =>
      val b = s.range(0, 60, 10).select(
        col("id").cast("int").as("lo"),
        (col("id") + 10).cast("int").as("hi"))
      val perBucket = Tables.part(s, d)
        .join(broadcast(b), col("p_size") >= col("lo") && col("p_size") < col("hi"))
        .groupBy(col("lo"), col("hi"))
        .agg(count(lit(1)).as("cnt"),
          Num.roundOut(avg(col("p_retailprice")), 4).as("avg_price"))
      b.join(perBucket, Seq("lo", "hi"), "left")
        .select(col("lo"), col("hi"),
          coalesce(col("cnt"), lit(0L)).as("n_parts"), col("avg_price"))
        .orderBy(col("lo"))
    },

    // J4 key merge of dimension rows with filtered fact counts — the
    // dashboard choropleth merge (reference: viz.py:234-238).
    QueryDef("q11_key_merge",
      """SELECT n.n_name AS nation_name, n.n_regionkey AS region_key,
        |       COALESCE(f.cnt, 0) AS n_building
        |FROM nation n
        |LEFT JOIN (SELECT c_nationkey, count(*) AS cnt FROM customer
        |           WHERE c_mktsegment = 'BUILDING' GROUP BY 1) f
        |  ON n.n_nationkey = f.c_nationkey
        |ORDER BY nation_name""".stripMargin) { (s, d) =>
      val filtered = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
      Tables.nation(s, d)
        .join(broadcast(filtered), col("n_nationkey") === col("c_nationkey"), "left")
        .select(col("n_name").as("nation_name"),
          col("n_regionkey").as("region_key"),
          coalesce(col("cnt"), lit(0L)).as("n_building"))
        .orderBy(col("nation_name"))
    },

    // Salted equi join — the skew mitigation for hot keys (event_type has
    // only 5 values: every row of a type lands on one task in a plain
    // shuffle join). Facts get a deterministic salt, the dim side explodes
    // to all salts; result is IDENTICAL to the plain join (the oracle
    // proves it), but the shuffle spreads each hot key over N tasks.
    QueryDef("q27_salted_join",
      """WITH dim AS (
        |  SELECT event_type, round(1e-9 + avg(value), 4) AS type_avg
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_id, e.event_type, d.type_avg
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val salts = 8
      val e = Tables.events(s, d)
      val dim = e.groupBy(col("event_type"))
        .agg(Num.roundOut(avg(col("value")), 4).as("type_avg"))
      val saltedFacts = e.withColumn("__salt",
        pmod(col("event_id"), lit(salts)).cast("int"))
      val saltedDim = dim.withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1))))
      saltedFacts.join(saltedDim, Seq("event_type", "__salt"))
        .select(col("event_id"), col("event_type"), col("type_avg"))
        .orderBy(col("event_id"))
    },

    // J5 lateral top-1 as-of join — the declared-but-unimplemented nearest-
    // weather-before-accident query (reference: queries.py:164-191). For
    // each purchase, the latest click by the same user at-or-before it.
    // Union + last(ignoreNulls) over a time window: linear, one shuffle.
    QueryDef("q12_asof_join",
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
        |         c.event_id AS click_id,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
        |)
        |SELECT purchase_id, user_id, click_id FROM j WHERE rn = 1
        |ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      // kind 0 = click (the "quote" stream), 1 = purchase (the probe);
      // at equal ts the click sorts first so `c.ts <= p.ts` includes it.
      val tagged = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("kind"), col("event_id"))
        .unionByName(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("kind"), col("event_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("click_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
        .orderBy(col("purchase_id"))
    },

    // Interval (range) join with NO equi key — "how many events from OTHER
    // users landed inside each session's time span" (the concurrency /
    // overlap metric). Left to itself Spark plans a pure range predicate as
    // BroadcastNestedLoopJoin or a cartesian product — quadratic at scale.
    // The standard rewrite (Flink interval join, Databricks range-join
    // optimization): EXPLODE each interval onto the fixed-width time
    // buckets it covers, bucket each point once, equi-join on the bucket,
    // then re-check exact containment. A point has exactly ONE bucket so no
    // pair is produced twice; join work is bounded by per-bucket density,
    // not |intervals|×|points|. Bucket width (1 h) trades explode fan-out
    // (intervals span few buckets) against false-pair filtering.
    // PlanShapeSpec asserts the plan shuffles on the bucket key and plans
    // no cartesian product.
    QueryDef("q58_interval_join",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS session_id
        |  FROM marked
        |), iv AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |         epoch_us(CAST(min(ts) AS TIMESTAMP)) AS start_us,
        |         epoch_us(CAST(max(ts) AS TIMESTAMP)) AS end_us,
        |         count(*) AS n_own
        |  FROM sess GROUP BY user_id, session_id
        |), ev AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events
        |)
        |SELECT iv.user_id, iv.session_id, iv.start_us, iv.end_us, iv.n_own,
        |       count(ev.ts_us) AS n_concurrent
        |FROM iv LEFT JOIN ev
        |  ON ev.ts_us BETWEEN iv.start_us AND iv.end_us
        | AND ev.user_id <> iv.user_id
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY iv.user_id, iv.session_id""".stripMargin) { (s, d) =>
      val gapMicros = 30L * 60L * 1000000L
      val bucketUs = 3600L * 1000000L // 1-hour buckets
      val sw = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val iv = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(sw))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(sw))
        .groupBy(col("user_id"), col("session_id"))
        .agg(unix_micros(min(col("ts"))).as("start_us"),
          unix_micros(max(col("ts"))).as("end_us"),
          count(lit(1)).as("n_own"))
      // DIV (exact long division) for bucket ids — a double divide + cast
      // truncation is inexact once epoch_us approaches 2^53.
      val ivb = iv.withColumn("bucket",
        explode(sequence(expr(s"start_us DIV $bucketUs"),
          expr(s"end_us DIV $bucketUs"))))
      val evb = Tables.events(s, d)
        .select(col("user_id").as("e_user"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("bucket", expr(s"ts_us DIV $bucketUs"))
      ivb.join(evb,
          ivb("bucket") === evb("bucket") &&
            col("ts_us").between(col("start_us"), col("end_us")) &&
            col("e_user") =!= col("user_id"),
          "left")
        .groupBy(col("user_id"), col("session_id"), col("start_us"),
          col("end_us"), col("n_own"))
        .agg(count(col("ts_us")).as("n_concurrent"))
        .orderBy(col("user_id"), col("session_id"))
    }
  )
}
