package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Skyline (Pareto-frontier) query — rows no other row dominates. A shape
  * relational engines lack a native operator for (reference scope: the
  * filter/top-k family in seng550_a3-etl queries.py generalized to
  * multi-criteria "best" rows), and the one place this library reaches for
  * `mapPartitions`: dominance is a theta-condition, so the naive form is an
  * O(n²) anti-join over the full table.
  *
  * The distributed form is two-phase:
  *   1. LOCAL PRUNE — each partition sorts by (price asc, size desc) and
  *      sweeps once, dropping any row strictly below the running max size:
  *      every dropped row is provably dominated by an earlier kept row.
  *      O(n log n) per partition, no shuffle, emits only local-skyline
  *      candidates (tiny: the frontier of a partition).
  *   2. GLOBAL VERIFY — the surviving candidate set (bounded by the sum of
  *      local frontier sizes, orders of magnitude under n) anti-joins
  *      itself under strict dominance via a BROADCAST nested-loop — the
  *      quadratic work is candidates², never n². Pruning is sound because
  *      dominance is transitive: a removed dominator is itself dominated
  *      by a survivor.
  *
  * The DuckDB oracle runs the literal NOT EXISTS dominance definition, so
  * the two-phase plan is hash-checked against the O(n²) semantics.
  */
object Pareto {

  val entries: Seq[QueryDef] = Seq(

    QueryDef("q67_skyline",
      """SELECT p_partkey, p_size, p_retailprice
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      import s.implicits._
      val pts = Tables.table(s, d, "part")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
        .as[(Long, Int, Double)]
      // phase 1: per-partition sweep. Sorted by price asc / size desc, a
      // row is dominated iff some earlier row has strictly larger size
      // (its price is <= by sort order; strictness holds on either axis).
      // `size >= best` over-keeps ties — harmless, phase 2 is exact.
      val local = pts
        .sortWithinPartitions(col("p_retailprice"), col("p_size").desc)
        .mapPartitions { it =>
          var best = Int.MinValue
          it.flatMap { case r @ (_, size, _) =>
            if (size >= best) { best = size; Some(r) } else None
          }
        }.toDF("p_partkey", "p_size", "p_retailprice")
      // phase 2: exact skyline of the candidates (skyline(candidates) ==
      // skyline(all) because phase 1 removed only dominated rows).
      val dom = local
        .select(col("p_size").as("q_size"), col("p_retailprice").as("q_price"))
      local.join(broadcast(dom),
          col("q_price") <= col("p_retailprice") &&
          col("q_size") >= col("p_size") &&
          (col("q_price") < col("p_retailprice") || col("q_size") > col("p_size")),
          "left_anti")
        .orderBy(col("p_partkey"))
    }
  )
}
