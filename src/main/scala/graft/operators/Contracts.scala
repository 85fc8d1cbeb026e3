package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Data-contract validation — the "expectations" layer every production
  * pipeline runs before publishing a table (Great-Expectations/dbt-test
  * shape, re-expressed relationally): range rules, NOT-NULL rules,
  * primary-key uniqueness, and referential integrity, each reported as
  * (rule, checked, violations, pass).
  *
  * Scale design: all range/null/uniqueness rules for one table are ONE
  * conditional-aggregation pass over that table (map-side partials, no
  * shuffle beyond the single-row final agg) unpivoted into rule rows;
  * referential integrity is a LEFT ANTI join — broadcast when the parent
  * key set fits, shuffle-hash otherwise, never a driver-side collect. A
  * 100 TB fact table is validated in one scan + one anti-join.
  */
object Contracts {

  /** (rule, checked, violations) rows from one single-row aggregate whose
    * columns are `n` + one violation count per rule. */
  private def unpivot(agg: DataFrame, rules: (String, String)*): DataFrame =
    agg.select(explode(array(rules.map { case (rule, vcol) =>
      struct(lit(rule).as("rule"), col("n").as("checked"),
        col(vcol).as("violations"))
    }: _*)).as("r"))
      .select(col("r.rule"), col("r.checked"), col("r.violations"))

  val entries: Seq[QueryDef] = Seq(

    QueryDef("x40_contract_check",
      """WITH li AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |         CAST(sum(CASE WHEN l_extendedprice <= 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |         count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_pk
        |  FROM lineitem
        |), ord AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(CASE WHEN o_totalprice <= 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |         count(*) - count(DISTINCT o_orderkey) AS v_pk
        |  FROM orders
        |), cst AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS v_name,
        |         count(*) - count(DISTINCT c_custkey) AS v_pk
        |  FROM customer
        |), fk_li AS (
        |  SELECT count(*) AS v FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey)
        |), fk_ord AS (
        |  SELECT count(*) AS v FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey)
        |)
        |SELECT rule, checked, violations, violations = 0 AS pass FROM (
        |  SELECT 'lineitem_quantity_range' AS rule, n AS checked,
        |         v_qty AS violations FROM li
        |  UNION ALL SELECT 'lineitem_price_positive', n, v_price FROM li
        |  UNION ALL SELECT 'lineitem_pk_unique', n, v_pk FROM li
        |  UNION ALL SELECT 'lineitem_fk_orders', li.n, fk_li.v
        |            FROM li, fk_li
        |  UNION ALL SELECT 'orders_totalprice_positive', n, v_price FROM ord
        |  UNION ALL SELECT 'orders_pk_unique', n, v_pk FROM ord
        |  UNION ALL SELECT 'orders_fk_customer', ord.n, fk_ord.v
        |            FROM ord, fk_ord
        |  UNION ALL SELECT 'customer_name_notnull', n, v_name FROM cst
        |  UNION ALL SELECT 'customer_pk_unique', n, v_pk FROM cst
        |) ORDER BY rule""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val ord = Tables.table(s, d, "orders")
      val cst = Tables.table(s, d, "customer")
      val liAgg = li.agg(
        count(lit(1)).as("n"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("v_qty"),
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("v_price"),
        (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
          .as("v_pk"))
      val ordAgg = ord.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_price"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"))
      val cstAgg = cst.agg(
        count(lit(1)).as("n"),
        sum(when(col("c_name").isNull, 1L).otherwise(0L)).as("v_name"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("v_pk"))
      // referential integrity: orphan children via LEFT ANTI (the parent
      // side is keys-only — broadcast-sized far beyond fixture scale)
      val fkLi = liAgg.select(col("n").as("checked")).crossJoin(
        li.join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("violations")))
        .select(lit("lineitem_fk_orders").as("rule"), col("checked"),
          col("violations"))
      val fkOrd = ordAgg.select(col("n").as("checked")).crossJoin(
        ord.join(cst.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("violations")))
        .select(lit("orders_fk_customer").as("rule"), col("checked"),
          col("violations"))
      unpivot(liAgg,
        "lineitem_quantity_range" -> "v_qty",
        "lineitem_price_positive" -> "v_price",
        "lineitem_pk_unique" -> "v_pk")
        .union(fkLi)
        .union(unpivot(ordAgg,
          "orders_totalprice_positive" -> "v_price",
          "orders_pk_unique" -> "v_pk"))
        .union(fkOrd)
        .union(unpivot(cstAgg,
          "customer_name_notnull" -> "v_name",
          "customer_pk_unique" -> "v_pk"))
        .select(col("rule"), col("checked"), col("violations"),
          (col("violations") === 0).as("pass"))
        .orderBy(col("rule"))
    },

    // k-ANONYMITY audit with a generalization ladder — the privacy gate a
    // training corpus passes before release (k=5, Sweeney 2002): a row's
    // quasi-identifier (event_type, day) is safe only if ≥ k rows share
    // it; unsafe rows generalize day→week→month, and rows still unique
    // at month granularity are redacted. The report histograms rows and
    // distinct users by the anonymity level they end up at — the
    // re-identification-risk summary, not just a pass/fail bit.
    //
    // Scale: three class-size tables (one partial-agg pass each, keyed
    // by type×calendar — calendar-bounded, so broadcastable at ANY
    // corpus size) joined back onto the fact; no per-row window, no
    // driver-side loop. The same ladder runs on a 100 TB event log with
    // the fact scanned once per granularity.
    QueryDef("x66_k_anonymity",
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS day,
        |         CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
        |         CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS mo
        |  FROM events
        |), cd AS (SELECT event_type, day, count(*) AS c FROM e GROUP BY 1, 2),
        |cw AS (SELECT event_type, wk, count(*) AS c FROM e GROUP BY 1, 2),
        |cm AS (SELECT event_type, mo, count(*) AS c FROM e GROUP BY 1, 2),
        |lv AS (
        |  SELECT e.event_type, e.user_id,
        |         CASE WHEN cd.c >= 5 THEN 'day'
        |              WHEN cw.c >= 5 THEN 'week'
        |              WHEN cm.c >= 5 THEN 'month'
        |              ELSE 'redacted' END AS level
        |  FROM e JOIN cd ON e.event_type = cd.event_type AND e.day = cd.day
        |         JOIN cw ON e.event_type = cw.event_type AND e.wk = cw.wk
        |         JOIN cm ON e.event_type = cm.event_type AND e.mo = cm.mo
        |)
        |SELECT event_type, level, count(*) AS n_rows,
        |       count(DISTINCT user_id) AS n_users
        |FROM lv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"),
        date_trunc("week", to_date(col("ts"))).cast("date").as("wk"),
        date_trunc("month", to_date(col("ts"))).cast("date").as("mo"))
      def classes(key: String) = e.groupBy(col("event_type"), col(key))
        .agg(count(lit(1)).as(s"c_$key"))
      e.join(broadcast(classes("day")), Seq("event_type", "day"))
        .join(broadcast(classes("wk")), Seq("event_type", "wk"))
        .join(broadcast(classes("mo")), Seq("event_type", "mo"))
        .select(col("event_type"), col("user_id"),
          when(col("c_day") >= 5, "day")
            .when(col("c_wk") >= 5, "week")
            .when(col("c_mo") >= 5, "month")
            .otherwise("redacted").as("level"))
        .groupBy(col("event_type"), col("level"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"), col("level"))
    },

    // PII SCAN + REDACTION PLAN — the privacy pass x66's k-anonymity
    // ladder doesn't cover: pattern-level detection and masking of
    // embedded identifiers in free text. The raw corpus carries no
    // identifier-shaped strings, so the scan runs over a DETERMINISTIC
    // synthesized log line per event (uid= / mail= / ip= fields derived
    // from the event row — m02's fake-payload-real-plumbing move): the
    // REGEX machinery (extract-all counts, global-replace masking,
    // exact masked-byte accounting) is what this operator pins, and a
    // real log table drops in as a column swap. Every count is an exact
    // integer; the redaction ratio is the one rounded float.
    //
    // Scale: scan-side only — per-row regexp extraction/replacement is
    // codegen'd column math with NO shuffle until the types-sized
    // report; this is the shape of a trillion-line PII sweep (the
    // regex engine cost per row is the whole cost, which is why the
    // masked-chars accounting matters for budgeting).
    QueryDef("x169_pii_scan",
      """WITH lines AS (
        |  SELECT event_type,
        |         'uid=' || CAST(user_id AS VARCHAR)
        |           || ' mail=user' || CAST(user_id AS VARCHAR)
        |           || '@example.org'
        |           || CASE WHEN event_id % 3 = 0
        |                   THEN ' cc=ops@example.org' ELSE '' END
        |           || ' ip=10.0.' || CAST(user_id % 256 AS VARCHAR)
        |           || '.' || CAST(event_id % 256 AS VARCHAR)
        |           || ' msg=' || event_type AS line
        |  FROM events
        |), scanned AS (
        |  SELECT event_type, line,
        |         len(regexp_extract_all(line,
        |             '[a-z0-9]+@[a-z0-9.]+')) AS n_email,
        |         len(regexp_extract_all(line,
        |             '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS n_ip,
        |         regexp_replace(regexp_replace(line,
        |             '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |             '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g')
        |           AS masked
        |  FROM lines
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(n_email) AS BIGINT) AS n_emails,
        |       CAST(sum(n_ip) AS BIGINT) AS n_ips,
        |       CAST(sum(len(line)) AS BIGINT) AS chars_in,
        |       CAST(sum(len(masked)) AS BIGINT) AS chars_out,
        |       round(1e-9 + 1.0 - sum(len(masked)) * 1.0 / sum(len(line)),
        |             4) AS masked_frac
        |FROM scanned GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      val lines = Tables.events(s, d)
        .select(col("event_type"),
          concat(lit("uid="), col("user_id").cast("string"),
            lit(" mail=user"), col("user_id").cast("string"),
            lit("@example.org"),
            when(col("event_id") % 3 === 0, " cc=ops@example.org")
              .otherwise(""),
            lit(" ip=10.0."), (col("user_id") % 256).cast("string"),
            lit("."), (col("event_id") % 256).cast("string"),
            lit(" msg="), col("event_type")).as("line"))
      val scanned = lines.select(col("event_type"), col("line"),
        size(expr("regexp_extract_all(line, '[a-z0-9]+@[a-z0-9.]+', 0)"))
          .as("n_email"),
        size(expr(
          "regexp_extract_all(line, '[0-9]+\\\\.[0-9]+\\\\.[0-9]+\\\\.[0-9]+', 0)"))
          .as("n_ip"),
        regexp_replace(
          regexp_replace(col("line"), "[a-z0-9]+@[a-z0-9.]+", "<EMAIL>"),
          "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+", "<IP>").as("masked"))
      scanned.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("n_email")).as("n_emails"),
          sum(col("n_ip")).as("n_ips"),
          sum(length(col("line"))).as("chars_in"),
          sum(length(col("masked"))).as("chars_out"),
          graft.functions.Num.roundOut(lit(1.0)
            - sum(length(col("masked"))) * 1.0 / sum(length(col("line"))),
            4).as("masked_frac"))
        .orderBy(col("event_type"))
    }
  )
}
