package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Multi-way join analytics over the TPC-H-shaped tables — the classic
  * star/snowflake shapes (Q3/Q5 silhouettes) that exercise Catalyst's join
  * ordering and broadcast selection on a fact (lineitem) plus a dimension
  * chain.
  *
  * Scale: every dimension (region→nation→customer/supplier, filtered
  * orders) stays orders of magnitude under the fact; Catalyst broadcasts
  * them, so lineitem is never shuffled for a join — its only exchange is
  * the final aggregation's partial/final hash agg. Filters (segment, date
  * windows, region name) are pushed into the parquet scans before any
  * join. The declared plan is a plain join chain: join ORDER is the
  * optimizer's decision, which is the point — at 100 TB, CBO/AQE re-order
  * beats any hand-fixed order.
  */
object Supply {

  /** The DERIVED partsupp relation. The driver testdata ships no partsupp
    * table, so the four partsupp-dependent TPC-H silhouettes (Q2/Q9/Q11/
    * Q20) were previously unimplementable; this derives one
    * DETERMINISTICALLY from the part and supplier keys (the x37
    * synthesized-relation convention): each part lists ≤4 suppliers
    * `(p_partkey·7 + j·13) mod |supplier|` for j ∈ 0..3 (distinct), with
    * integer availability and cost-in-cents from key-mixing formulas —
    * both engines recompute the identical relation, so every downstream
    * query stays oracle-checkable. Cost stays in CENTS (integer) so
    * profit/value aggregates are exact sums.
    *
    * Scale: generation is a 4-way explode of the part table with a 1-row
    * broadcast (|supplier|) — no part×supplier cross join; at production
    * scale partsupp is of course a real table and these queries run
    * unchanged on it. */
  private[graft] val partsuppCteSql: String =
    """ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM supplier),
      |psk AS (
      |  SELECT DISTINCT p.p_partkey,
      |         (p.p_partkey * 7 + j.j * 13) % ns.n AS ps_suppkey
      |  FROM part p CROSS JOIN (SELECT unnest(range(4)) AS j) j, ns
      |), psx AS (
      |  SELECT p_partkey, ps_suppkey,
      |         (p_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS ps_availqty,
      |         (p_partkey * 13 + ps_suppkey * 7) % 99900 + 100
      |           AS ps_cost_cents
      |  FROM psk
      |)""".stripMargin

  private[graft] def partsuppTable(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val ns = Tables.supplier(s, d).agg(count(lit(1)).as("n"))
    Tables.part(s, d).select(col("p_partkey"))
      .crossJoin(broadcast(ns))
      .select(col("p_partkey"),
        explode(sequence(lit(0L), lit(3L))).as("j"), col("n"))
      .select(col("p_partkey"),
        pmod(col("p_partkey") * 7 + col("j") * 13, col("n")).as("ps_suppkey"))
      .distinct()
      .select(col("p_partkey"), col("ps_suppkey"),
        (pmod(col("p_partkey") * 31 + col("ps_suppkey") * 17, lit(9999L)) + 1)
          .as("ps_availqty"),
        (pmod(col("p_partkey") * 13 + col("ps_suppkey") * 7, lit(99900L)) + 100)
          .as("ps_cost_cents"))
  }

  val entries: Seq[QueryDef] = Seq(

    // Q3 silhouette: unshipped-revenue top-k per order. Deterministic
    // total order (rounded revenue DESC, then orderkey) before the LIMIT.
    QueryDef("q56_supply_topk",
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_day,
        |       round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |         AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < DATE '1997-01-01'
        |  AND l.l_shipdate > DATE '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val customer = Tables.table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val orders = Tables.table(s, d, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast("date"))
      val lineitem = Tables.table(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01").cast("date"))
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(lineitem, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(Num.roundOut(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"),
          col("o_orderdate").cast("date").as("order_day"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Q5 silhouette: per-nation revenue with LOCAL suppliers (supplier and
    // customer share a nation) inside one region and a date window — the
    // six-table snowflake.
    QueryDef("q57_region_revenue",
      """SELECT n_name,
        |       round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |         AS revenue,
        |       count(*) AS n_items
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1995-01-01'
        |  AND o_orderdate < DATE '1999-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      val region = Tables.table(s, d, "region").filter(col("r_name") === "ASIA")
      val nation = Tables.table(s, d, "nation")
      val customer = Tables.table(s, d, "customer")
      val orders = Tables.table(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1999-01-01").cast("date"))
      val lineitem = Tables.table(s, d, "lineitem")
      val supplier = Tables.table(s, d, "supplier")
      region
        .join(nation, col("n_regionkey") === col("r_regionkey"))
        .join(customer, col("c_nationkey") === col("n_nationkey"))
        .join(orders, col("o_custkey") === col("c_custkey"))
        .join(lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(supplier, col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(Num.roundOut(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    // Q18 silhouette (large-volume orders): the HAVING-on-aggregate
    // semi-join shape — find orders whose total quantity exceeds a
    // threshold, then pull customer/order detail for just those. Declared
    // as aggregate → filter → join back; Catalyst runs the quantity
    // rollup as a partial/final hash agg on the fact, and the surviving
    // key set (rare by construction) joins back to orders/customer. At
    // 100 TB the filtered key set is small enough that AQE converts the
    // join-back to broadcast at runtime — the plan a hand-written
    // IN-subquery would also reach.
    QueryDef("q60_big_orders",
      """SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |       CAST(o.o_orderdate AS DATE) AS order_day,
        |       round(1e-9 + o.o_totalprice, 2) AS total_price,
        |       CAST(t.sum_qty AS BIGINT) AS sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 250) t
        |JOIN orders o ON o.o_orderkey = t.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY total_price DESC, o.o_orderkey""".stripMargin) { (s, d) =>
      val bigOrders = Tables.table(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      bigOrders
        .join(Tables.table(s, d, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.table(s, d, "customer"),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_day"),
          Num.roundOut(col("o_totalprice"), 2).as("total_price"),
          col("sum_qty").cast("long").as("sum_qty"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
    },

    // TPC-H Q15 shape (top supplier by windowed revenue): a revenue CTE
    // reused twice — once as the join input, once under a scalar max() —
    // selecting every supplier tied at the maximum. The revenue aggregate
    // runs ONCE per reference on a date-pruned scan (predicate reaches the
    // parquet reader); the scalar max is a one-row broadcast, so the
    // "WHERE total_rev = (SELECT max…)" is a broadcast-filter, not a
    // self-join shuffle. Revenue is rounded identically on both sides
    // BEFORE the max/equality so summation-order drift can't split ties.
    QueryDef("q62_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |         round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |           AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s.s_suppkey, s.s_name, r.total_rev
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
        |WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
      val rev = Tables.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(Num.roundOut(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_rev"))
        .localCheckpoint() // one aggregate feeds the max AND the join
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      Tables.table(s, d, "supplier")
        .join(rev, col("s_suppkey") === col("suppkey"))
        .crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q22 shape (the "rich but dormant" report): customers whose
    // balance beats the positive-balance average and who placed NO order
    // since 2001, grouped by nation. The global average is a one-row
    // broadcast; dormancy is a LEFT ANTI join against the date-pruned
    // orders scan (the anti side shrinks to recent keys before shuffling);
    // nation is a broadcast dim. The threshold is rounded identically on
    // both sides before the comparison so avg summation-order drift can't
    // flip a boundary customer.
    QueryDef("q63_dormant_rich",
      """WITH t AS (
        |  SELECT round(1e-9 + avg(c_acctbal), 2) AS a
        |  FROM customer WHERE c_acctbal > 0
        |)
        |SELECT n.n_name, count(*) AS numcust,
        |       round(1e-9 + sum(c.c_acctbal), 2) AS totacctbal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey, t
        |WHERE c.c_acctbal > t.a
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, d) =>
      val cust = Tables.table(s, d, "customer")
      val thr = cust.filter(col("c_acctbal") > 0)
        .agg(Num.roundOut(avg(col("c_acctbal")), 2).as("a"))
      val recent = Tables.table(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("a"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.table(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          Num.roundOut(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("n_name"))
    },

    // Q21 silhouette (suppliers who kept orders waiting): the schema has
    // no commit/receipt dates, so "late" is shipped more than 90 days
    // after the order date. The correlated EXISTS / NOT EXISTS pair is
    // rewritten as ONE per-order aggregate — distinct suppliers and
    // distinct LATE suppliers — then late lines join back and keep orders
    // where another supplier participated (n_supp >= 2) but this was the
    // only late one (n_late_supp = 1). The DuckDB oracle runs the literal
    // EXISTS form, so the rewrite's equivalence is hash-checked.
    //
    // Scale: the fact joins orders on o_orderkey and both the stats
    // aggregate and the join-back hash on the same l_orderkey keying, so
    // Catalyst reuses one exchange of the fact; supplier is broadcast.
    // The classic nested-loop decorrelation (one subquery probe per row)
    // never appears.
    QueryDef("q65_waiting_suppliers",
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin) { (s, d) =>
      val fOrders = Tables.table(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lines = Tables.table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"), col("late"))
      // two-level aggregate instead of dual COUNT(DISTINCT): a per-
      // (order, supplier) any-late pass, then plain counts per order.
      // Both levels' clustering is satisfied by the join's existing
      // l_orderkey hash partitioning (subset rule), so NEITHER adds an
      // exchange — the Expand plan a dual distinct-aggregate produces
      // would double the fact rows through two more shuffles.
      val orderStats = lines
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("supp_late"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supp"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .select(col("l_orderkey"))
      lines.filter(col("late"))
        .join(orderStats, Seq("l_orderkey"))
        .join(broadcast(Tables.table(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).cast("long").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // Q17 silhouette (small-quantity-order revenue): a correlated scalar
    // aggregate — "below 20% of THIS part's average quantity" — becomes a
    // per-part aggregate of the fact self-joined back onto the fact.
    // Distinct from q62's global scalar: the threshold is per GROUP.
    //
    // Scale: both the avg-aggregate and the join-back hash lineitem on
    // l_partkey, so AQE reuses one exchange of the fact; the part-type
    // filter prunes via a broadcast join before the heavy self-join. The
    // row-per-probe decorrelation never appears in the plan.
    QueryDef("q66_small_qty_revenue",
      """SELECT round(1e-9 + sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
        |      FROM lineitem GROUP BY l_partkey) t
        |  ON t.l_partkey = l.l_partkey
        |WHERE p.p_type = 'ECONOMY' AND l.l_quantity < t.qty_lim""".stripMargin) { (s, d) =>
      val econParts = Tables.table(s, d, "part")
        .filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey").as("l_partkey"))
      // filter BOTH sides by the broadcast part-type dim first: each
      // part's average is unchanged (it is per-partkey over all its
      // lines), and the avg-side and probe-side exchanges become the
      // IDENTICAL subplan, so Catalyst plans one fact shuffle (ReuseExchange)
      val li = Tables.table(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(econParts), Seq("l_partkey"))
      val lims = li.groupBy(col("l_partkey"))
        .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_lim"))
      li.join(lims, Seq("l_partkey"))
        .filter(col("l_quantity") < col("qty_lim"))
        .agg(Num.roundOut(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    },

    // TPC-H Q2 silhouette — MIN-COST SUPPLIER per part within a region:
    // the correlated-min shape (for each mid-size part, the cheapest
    // EUROPE supplier, ties to the smallest suppkey). Runs on the
    // derived [[partsuppCteSql]] relation; the region chain
    // (region→nation→supplier) collapses to a broadcast before partsupp
    // ever joins, and the per-part min is a rank window over the
    // candidate rows — the decorrelated form of Q2's scalar subquery.
    QueryDef("q90_min_cost_supplier",
      s"""WITH $partsuppCteSql, eu AS (
        |  SELECT s.s_suppkey, s.s_name, n.n_name
        |  FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'
        |), cand AS (
        |  SELECT p.p_partkey, p.p_type, psx.ps_cost_cents,
        |         eu.s_suppkey, eu.s_name, eu.n_name,
        |         row_number() OVER (PARTITION BY p.p_partkey
        |           ORDER BY psx.ps_cost_cents, eu.s_suppkey) AS rn
        |  FROM psx JOIN eu ON psx.ps_suppkey = eu.s_suppkey
        |       JOIN part p ON p.p_partkey = psx.p_partkey
        |  WHERE p.p_size BETWEEN 10 AND 25
        |)
        |SELECT p_partkey, p_type, s_suppkey, s_name, n_name,
        |       CAST(ps_cost_cents AS BIGINT) AS ps_cost_cents
        |FROM cand WHERE rn = 1 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val eu = Tables.supplier(s, d)
        .join(Tables.nation(s, d),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val W = org.apache.spark.sql.expressions.Window
      partsuppTable(s, d)
        .join(broadcast(eu), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_size").between(10, 25))
          .select(col("p_partkey"), col("p_type"))), "p_partkey")
        .withColumn("rn", row_number().over(
          W.partitionBy(col("p_partkey"))
            .orderBy(col("ps_cost_cents"), col("s_suppkey"))))
        .filter(col("rn") === 1)
        .select(col("p_partkey"), col("p_type"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("ps_cost_cents"))
        .orderBy(col("p_partkey"))
    },

    // TPC-H Q9 silhouette — PRODUCT-TYPE PROFIT by nation and year:
    // profit = revenue − supply cost, per supplying nation per order
    // year. Every money amount quantizes to CENTS per row BEFORE the
    // sum (floor(100·ext·(1−disc)) − cost_cents·qty — exact integers),
    // so the cross-engine aggregate is drift-free. The join chain is the
    // classic fact-plus-broadcast-dims shape: lineitem joins the derived
    // partsupp on (partkey, suppkey) — the only composite-key join in
    // the TPC-H tier — then supplier→nation and orders attach year.
    QueryDef("q91_nation_profit",
      s"""WITH $partsuppCteSql
        |SELECT n.n_name AS nation,
        |       CAST(year(o.o_orderdate) AS INT) AS o_year,
        |       CAST(sum(CAST(floor(100 * l.l_extendedprice
        |                           * (1 - l.l_discount)) AS BIGINT)
        |                - psx.ps_cost_cents * CAST(l.l_quantity AS BIGINT))
        |            AS BIGINT) AS profit_cents
        |FROM lineitem l
        |JOIN psx ON psx.p_partkey = l.l_partkey
        |        AND psx.ps_suppkey = l.l_suppkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(partsuppTable(s, d),
          col("l_partkey") === col("p_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          (floor(lit(100) * col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("long")
            - col("ps_cost_cents") * col("l_quantity").cast("long"))
            .as("p"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("p")).as("profit_cents"))
        .orderBy(col("nation"), col("o_year"))
    },

    // TPC-H Q11 silhouette — IMPORTANT STOCK: parts whose inventory
    // value at nation-3 suppliers exceeds 0.1% of that nation's total
    // (the HAVING-over-global-scalar shape). The threshold is the
    // integer predicate value·1000 > total — no float boundary — and
    // the share column is the single final division.
    QueryDef("q92_important_stock",
      s"""WITH $partsuppCteSql, sup3 AS (
        |  SELECT s_suppkey FROM supplier WHERE s_nationkey = 3
        |), v AS (
        |  SELECT psx.p_partkey,
        |         CAST(sum(ps_cost_cents * ps_availqty) AS BIGINT)
        |           AS value_cents
        |  FROM psx JOIN sup3 ON psx.ps_suppkey = sup3.s_suppkey
        |  GROUP BY psx.p_partkey
        |), t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total FROM v)
        |SELECT p_partkey, value_cents,
        |       round(1e-9 + value_cents * 1.0 / t.total, 6) AS share
        |FROM v, t WHERE value_cents * 1000 > t.total
        |ORDER BY value_cents DESC, p_partkey""".stripMargin) { (s, d) =>
      val sup3 = Tables.supplier(s, d).filter(col("s_nationkey") === 3)
        .select(col("s_suppkey"))
      val v = partsuppTable(s, d)
        .join(broadcast(sup3), col("ps_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"))
        .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("value_cents"))
      val t = v.agg(sum(col("value_cents")).as("total"))
      v.crossJoin(broadcast(t))
        .filter(col("value_cents") * 1000 > col("total"))
        .select(col("p_partkey"), col("value_cents"),
          Num.roundOut(col("value_cents") * 1.0 / col("total"), 6).as("share"))
        .orderBy(col("value_cents").desc, col("p_partkey"))
    },

    // TPC-H Q20 silhouette — EXCESS AVAILABILITY: suppliers holding more
    // than half their shipped volume in stock, per part (the
    // overstocked-supplier report behind Q20's nested IN chain, here as
    // the decorrelated join + integer predicate 2·availqty > shipped).
    QueryDef("q93_excess_availability",
      s"""WITH $partsuppCteSql, shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY l_partkey, l_suppkey
        |), ex AS (
        |  SELECT psx.ps_suppkey, count(*) AS n_excess,
        |         CAST(sum(psx.ps_availqty) AS BIGINT) AS stock_total
        |  FROM psx JOIN shipped sh ON sh.l_partkey = psx.p_partkey
        |                          AND sh.l_suppkey = psx.ps_suppkey
        |  WHERE 2 * psx.ps_availqty > sh.q
        |  GROUP BY psx.ps_suppkey
        |)
        |SELECT s.s_suppkey, s.s_name, ex.n_excess, ex.stock_total
        |FROM ex JOIN supplier s ON s.s_suppkey = ex.ps_suppkey
        |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
      val shipped = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      partsuppTable(s, d)
        .join(shipped,
          col("p_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .filter(lit(2) * col("ps_availqty") > col("q"))
        .groupBy(col("ps_suppkey"))
        .agg(count(lit(1)).as("n_excess"), sum(col("ps_availqty")).as("stock_total"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("ps_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_excess"),
          col("stock_total"))
        .orderBy(col("s_suppkey"))
    }
  )
}
