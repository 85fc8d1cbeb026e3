package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** The remaining classic TPC-H silhouettes (Q1/Q4/Q7/Q8/Q10/Q13/Q14/Q16/
  * Q19) over the driver's star schema — the scan-heavy aggregate, the
  * EXISTS semi-join, the two-sided nation pair, the market-share ratio,
  * the outer-join histogram, the OR-of-ANDs pushdown, and the distinct
  * aggregate. Together with Supply.scala (Q3/Q5/Q15/Q17/Q18/Q21/Q22)
  * these cover every TPC-H query shape expressible on the available
  * columns (no partsupp table, no commit/receipt dates).
  *
  * Scale: each query's comment states its exchange budget. The common
  * theme: dimensions broadcast (region/nation always; part/supplier/
  * customer after their filters), so lineitem — the 100 TB table — is
  * shuffled at most once, and only when an aggregation key demands it.
  */
object Classic {

  val entries: Seq[QueryDef] = Seq(

    // TPC-H Q1 (pricing summary): the canonical scan-heavy report — one
    // pass over the fact, partial/final hash agg on a 6-value group key.
    // No join, no wide shuffle: the exchange carries 6 rows × 8 partial
    // sums. At 100 TB this is bandwidth-bound on the parquet scan, which
    // is the optimum; ReadSchema prunes to the 7 referenced columns.
    QueryDef("q68_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       round(1e-9 + sum(l_quantity), 2) AS sum_qty,
        |       round(1e-9 + sum(l_extendedprice), 2) AS sum_base_price,
        |       round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |         AS sum_disc_price,
        |       round(1e-9 + sum(l_extendedprice * (1 - l_discount)
        |                        * (1 + l_tax)), 2) AS sum_charge,
        |       round(1e-9 + avg(l_quantity), 4) AS avg_qty,
        |       round(1e-9 + avg(l_extendedprice), 4) AS avg_price,
        |       round(1e-9 + avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Num.roundOut(sum(col("l_quantity")), 2).as("sum_qty"),
          Num.roundOut(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          Num.roundOut(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          Num.roundOut(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          Num.roundOut(avg(col("l_quantity")), 4).as("avg_qty"),
          Num.roundOut(avg(col("l_extendedprice")), 4).as("avg_price"),
          Num.roundOut(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q4 (order-priority checking): EXISTS(one late line) becomes a
    // LEFT SEMI join orders ⋉ lineitem on the order key plus the non-equi
    // lateness conjunct — hash semi on l_orderkey, extra predicate
    // evaluated on probe. The date filter prunes orders at the scan; the
    // fact never aggregates, it only dedups into the semi's hash set.
    QueryDef("q72_priority_check",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val lines = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
      orders
        .join(lines, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q7 (volume shipping): revenue between a nation PAIR by ship
    // year. Both nation dims filter to one row each and broadcast; the
    // pair disjunction evaluates after the supplier/customer hops. The
    // supplier and customer dims stay broadcast-size, so the fact's only
    // exchange is the final 4-row aggregate.
    QueryDef("q69_volume_shipping",
      """SELECT supp_nation, cust_nation, l_year,
        |       round(1e-9 + sum(volume), 2) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |             l_extendedprice * (1 - l_discount) AS volume
        |      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |      JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      JOIN customer c ON c.c_custkey = o.o_custkey
        |      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |      WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |          OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01') t
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val pair = Seq("NATION_18", "NATION_19")
      val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li
        .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(Num.roundOut(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8 (market share): one nation's share of a region's imports of
    // one part type, by order year. Declared as ONE aggregate with a
    // conditional numerator (sum-when) instead of TPC-H's two-branch CASE
    // subquery — same semantics, half the plan. Num/denom are rounded to
    // cents BEFORE the division on both engines, so the share is a ratio
    // of two exact decimals and the hash can't drift with summation order.
    QueryDef("q70_market_share",
      """WITH vols AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |         round(1e-9 + sum(CASE WHEN n2.n_name = 'NATION_3'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0 END), 2) AS nat_vol,
        |         round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |           AS all_vol
        |  FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey = r.r_regionkey
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'LARGE'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY year(o_orderdate))
        |SELECT o_year, nat_vol, all_vol,
        |       round(1e-9 + nat_vol / all_vol, 6) AS mkt_share
        |FROM vols ORDER BY o_year""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d).filter(col("p_type") === "LARGE")
        .select(col("p_partkey"))
      val custRegion = Tables.customer(s, d)
        .join(Tables.nation(s, d).select(col("n_nationkey"), col("n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, d)
        .join(Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val vols = Tables.lineitem(s, d)
        .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
        .join(broadcast(suppNation), col("s_suppkey") === col("l_suppkey"))
        .join(orders, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(custRegion), col("c_custkey") === col("o_custkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          Num.roundOut(sum(when(col("supp_nation") === "NATION_3",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0))), 2).as("nat_vol"),
          Num.roundOut(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("all_vol"))
      vols.select(col("o_year"), col("nat_vol"), col("all_vol"),
          Num.roundOut(col("nat_vol") / col("all_vol"), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q10 (returned items): top-20 customers by returned revenue in
    // a quarter. The date-pruned orders side shrinks the fact join; nation
    // broadcasts; TakeOrderedAndProject does the distributed top-k (no
    // global sort materializes).
    QueryDef("q71_returned_items",
      """SELECT c.c_custkey, c.c_name,
        |       round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |         AS revenue,
        |       round(1e-9 + c.c_acctbal, 2) AS acctbal, n.n_name
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-07-01'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(Num.roundOut(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          Num.roundOut(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q13 (customer order-count distribution): the outer-join
    // histogram — every customer keeps a row (COUNT of a null key is 0),
    // then the per-customer counts histogram. Two aggregates, each a
    // narrow exchange (custkey ints, then tiny count groups).
    QueryDef("q73_cust_order_dist",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c LEFT JOIN orders o
        |        ON c.c_custkey = o.o_custkey
        |           AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14 (promo revenue share): one month's promo-type share of
    // revenue — conditional numerator over one date-pruned scan, part dim
    // broadcast. Both sums exact-rounded before the percentage division
    // (same determinism contract as q70).
    QueryDef("q74_promo_revenue",
      """WITH s AS (
        |  SELECT round(1e-9 + sum(CASE WHEN p_type = 'PROMO'
        |           THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
        |           AS promo_rev,
        |         round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |           AS total_rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        |    AND l.l_shipdate < TIMESTAMP '1997-04-01')
        |SELECT promo_rev, total_rev,
        |       round(1e-9 + 100.0 * promo_rev / total_rev, 4) AS promo_pct
        |FROM s""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
          col("p_partkey") === col("l_partkey"))
        .agg(
          Num.roundOut(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0))), 2).as("promo_rev"),
          Num.roundOut(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          Num.roundOut(lit(100.0) * col("promo_rev") / col("total_rev"), 4)
            .as("promo_pct"))
    },

    // TPC-H Q16 (supplier count by part bucket): the distinct-aggregate
    // shape — distinct suppliers per (brand, type, size). The part filter
    // broadcasts; count(DISTINCT) plans as a two-level partial-distinct
    // aggregate (dedup locally per partition, then merge), so the
    // exchange carries already-deduped (bucket, suppkey) pairs, not raw
    // fact rows.
    QueryDef("q76_supplier_cnt",
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 30""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(30)
    },

    // TPC-H Q19 (OR-of-ANDs discounted revenue): the disjunctive-predicate
    // pushdown test. The part-side half of each disjunct (brand + size)
    // pre-filters the broadcast dim — only parts that could satisfy SOME
    // branch survive — and the full mixed-side disjunction evaluates after
    // the join. Catalyst derives exactly this split via constraint
    // propagation; declaring it keeps the plan stable without CBO.
    QueryDef("q75_disjunct_revenue",
      """SELECT round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2)
        |         AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 21)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
        |       AND l.l_quantity BETWEEN 10 AND 30)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
        |       AND l.l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d)
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
        .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 21)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 40)))
        .agg(Num.roundOut(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q6 (forecast revenue change): the pure scan query — three
    // range predicates, no join, one global aggregate. All three
    // predicates push into the parquet scan; the exchange carries one
    // partial row per partition. The simplest query in the suite and the
    // purest pushdown test.
    QueryDef("q81_forecast_revenue",
      """SELECT round(1e-9 + sum(l_extendedprice * l_discount), 2)
        |         AS revenue_delta,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(Num.roundOut(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue_delta"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q12 silhouette (shipping-mode priority classes; the schema
    // has no l_shipmode, so return-flag plays the class key): the
    // conditional two-class count after a fact-dim join with a
    // cross-table predicate (shipped after ordered). orders joins on the
    // fact's key — at 100 TB AQE picks shuffle-hash or broadcast by
    // orders' filtered size; the sum-when classes compile to one
    // conditional aggregate, not two passes.
    QueryDef("q82_priority_classes",
      """SELECT l.l_returnflag,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > o.o_orderdate
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(hi, 1).otherwise(0)).cast("long").as("high_line_count"),
          sum(when(hi, 0).otherwise(1)).cast("long").as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // LATERAL correlated subquery — the ANSI top-N-per-group surface
    // (nation × its 2 richest customers) exercised THROUGH SPARK SQL's
    // lateral join, not rewritten by hand: Catalyst's DecorrelateInnerQuery
    // turns the correlated ORDER BY + LIMIT into a partitioned window
    // top-k under the hood, which is exactly the plan a hand-written
    // row_number() filter would produce — the point is that the DECLARED
    // form is the lateral SQL both engines accept verbatim.
    //
    // Scale: decorrelation means NO per-nation re-execution of the inner
    // query (the naive lateral interpretation); one customer shuffle
    // keyed by c_nationkey, per-key heap top-2, broadcast nation join.
    QueryDef("q85_lateral_topn",
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n JOIN LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t ON true
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("q85_nation")
      Tables.customer(s, d).createOrReplaceTempView("q85_customer")
      s.sql("""
        |SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM q85_nation n JOIN LATERAL (
        |  SELECT c_custkey, c_acctbal FROM q85_customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
    },

    // TPC-H Q16 PROPER — parts/supplier relationship count over the
    // derived partsupp (q76 is the partsupp-FREE silhouette; with
    // [[Supply.partsuppTable]] the real shape is now expressible): for
    // each (brand, type, size) outside an excluded brand and inside a
    // size set, how many DISTINCT suppliers stock it — minus the
    // "complaint" suppliers (suppkey % 7 = 2, the deterministic
    // synthesized exclusion standing in for Q16's LIKE '%Complaints%').
    // The NOT-IN decorrelates to a left-anti join; the distinct count
    // shuffles (brand, type, size, suppkey) once.
    QueryDef("q94_partsupp_supplier_cnt",
      s"""WITH ${Supply.partsuppCteSql}
        |SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
        |       CAST(count(DISTINCT psx.ps_suppkey) AS BIGINT)
        |         AS supplier_cnt
        |FROM psx JOIN part p ON p.p_partkey = psx.p_partkey
        |WHERE p.p_brand <> 'Brand#1'
        |  AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
        |  AND psx.ps_suppkey NOT IN (
        |        SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 2)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size""".stripMargin) { (s, d) =>
      val complaints = Tables.supplier(s, d)
        .filter(col("s_suppkey") % 7 === 2).select(col("s_suppkey"))
      val parts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      Supply.partsuppTable(s, d)
        .join(broadcast(complaints),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), "p_partkey")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("int").as("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // THEIL–SEN ROBUST TREND over the weekly revenue series — the
    // outlier-proof companion to q81's point estimate and x173's ACF:
    // the median of all pairwise slopes (rev_b − rev_a)/(day_b − day_a),
    // reported next to the classical OLS slope over the SAME series so
    // a gap between the two is itself the outlier signal (Theil-Sen has
    // a 29% breakdown point; OLS has none). Money goes EXACT before any
    // aggregation: each order's price becomes integer cents (one biased
    // round of price·100 — exact, the value IS a cent multiple), weekly
    // cents sum as integers, and the series is floor-dollars of exact
    // cents — so no weekly sum can sit on a float rounding boundary
    // (the q81 double-sum discipline is fine for ONE reported number,
    // but 360 weekly sums would each be a coin-flip at an exact-.50
    // boundary). Every slope is then one IEEE division of exact
    // integers and the median is deterministic cross-engine with
    // (slope, wa, wb) as the total tiebreak order.
    //
    // Scale: the corpus pass is the weekly groupBy (map-side combine to
    // a weeks-bounded series, ~360 rows on any TPC-H calendar at ANY
    // scale factor). The pair join and its rank window run on weeks² ≈
    // 65k rows — bounded by the calendar, not the data, which is what
    // makes the O(n²) estimator admissible here (enrolled in the
    // Round9Spec global-window table with that bound). OLS moments are
    // five integer sums over the same bounded series.
    QueryDef("x175_theil_sen", Classic.x175OracleSql) { (s, d) =>
      Classic.theilSenReport(Classic.weeklyCents(Tables.orders(s, d)))
    }
  )

  /** x175's full oracle — shared VERBATIM with st26's streaming trend
    * maintenance (the q78↔st13 / x174↔st25 contract applied to the
    * weekly revenue series): one answer definition for both paths. */
  private[graft] def x175OracleSql: String =
    """WITH wc AS (
      |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS w,
      |         CAST(sum(CAST(round(1e-9 + o_totalprice * 100) AS BIGINT))
      |              AS BIGINT) AS cents
      |  FROM orders GROUP BY 1
      |), wk AS (
      |  SELECT w, cents // 100 AS rev FROM wc
      |), mo AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nw, min(w) AS w0 FROM wk
      |), xs AS (
      |  SELECT datediff('day', mo.w0, wk.w) AS x, wk.rev
      |  FROM wk CROSS JOIN mo
      |), ols AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(rev) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(x * rev) AS BIGINT) AS sxy
      |  FROM xs
      |), sl AS (
      |  SELECT a.w AS wa, b.w AS wb,
      |         (b.rev - a.rev) * 1.0 / datediff('day', a.w, b.w) AS slope
      |  FROM wk a JOIN wk b ON b.w > a.w
      |), rk AS (
      |  SELECT slope, row_number() OVER (ORDER BY slope, wa, wb) AS r
      |  FROM sl
      |), mm AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m FROM sl
      |), med AS (
      |  SELECT avg(slope) AS ts FROM rk CROSS JOIN mm
      |  WHERE r >= (m + 1) // 2 AND r <= (m + 2) // 2
      |)
      |SELECT mo.nw AS n_weeks, mm.m AS n_pairs,
      |       round(1e-9 + med.ts, 4) AS ts_slope,
      |       round(1e-9 + (ols.n * ols.sxy - ols.sx * ols.sy) * 1.0
      |             / (ols.n * ols.sxx - ols.sx * ols.sx), 4) AS ols_slope
      |FROM mo, mm, med, ols""".stripMargin

  /** One batch of orders → its ADDITIVE (w, cents) weekly-revenue delta
    * (exact integer cents — the x175 money discipline), the state st26
    * maintains: each order lands in exactly one batch, integer sums
    * commute, so the folded state equals the full-table series
    * bit-for-bit regardless of slicing. */
  private[graft] def weeklyCents(
      orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    orders
      .groupBy(date_trunc("week", col("o_orderdate")).cast("date").as("w"))
      .agg(sum(round(lit(1e-9) + col("o_totalprice") * 100).cast("long"))
        .as("cents"))

  /** The (w, cents) weekly series → full x175 Theil–Sen report — shared
    * by the batch entry and st26's converged-stream readout. Input is
    * weeks-bounded; the pair stage is weeks² (calendar-bounded). */
  private[graft] def theilSenReport(
      wc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wk = wc.select(col("w"), expr("cents div 100").as("rev"))
      .localCheckpoint() // weeks-bounded; pair join + moments read it
    val mo = wk.agg(count(lit(1)).as("nw"), min(col("w")).as("w0"))
    val ols = wk.crossJoin(broadcast(mo))
      .select(datediff(col("w"), col("w0")).cast("long").as("x"),
        col("rev"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("rev")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("rev")).as("sxy"))
    val sl = wk.select(col("w").as("wa"), col("rev").as("ra"))
      .join(wk.select(col("w").as("wb"), col("rev").as("rb")),
        col("wb") > col("wa"))
      .select(col("wa"), col("wb"),
        ((col("rb") - col("ra")) * 1.0
          / datediff(col("wb"), col("wa"))).as("slope"))
    val mm = sl.agg(count(lit(1)).as("m"))
    val med = sl
      .withColumn("r", row_number().over(
        Window.orderBy(col("slope"), col("wa"), col("wb"))))
      .crossJoin(broadcast(mm))
      .filter(col("r") >= expr("(m + 1) div 2") &&
        col("r") <= expr("(m + 2) div 2"))
      .agg(avg(col("slope")).as("ts"))
    mo.crossJoin(mm).crossJoin(med).crossJoin(ols)
      .select(col("nw").as("n_weeks"), col("m").as("n_pairs"),
        Num.roundOut(col("ts"), 4).as("ts_slope"),
        Num.roundOut((col("n") * col("sxy") - col("sx") * col("sy")) * 1.0
          / (col("n") * col("sxx") - col("sx") * col("sx")), 4)
          .as("ols_slope"))
  }
}
