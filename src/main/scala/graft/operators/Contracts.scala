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
    }
  )
}
