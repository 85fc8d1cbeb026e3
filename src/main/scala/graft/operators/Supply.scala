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
    }
  )
}
