package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q84 (frontier BFS) and q85 (lateral top-n): convergence,
  * distance sanity, and the decorrelated physical plan. */
class GraphLateralSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q84: distances are BFS-consistent on the synthetic graph") {
    val rows = SparkEntry.queries("q84_bfs")(spark, sf0_001)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(rows(0) == 0, "seed at distance 0")
    assert(rows.values.forall(d => d >= 0 && d <= 6))
    // triangle inequality across every edge of the graph: |d(u)-d(v)| <= 1
    // for reached neighbors (BFS layering invariant)
    val edges = Tables.documents(spark, sf0_001)
      .filter(col("doc_id") < 400 && (col("doc_id") * 48271) % 100 < 18)
      .select((col("doc_id") % 20).cast("int").as("src"),
        expr("CAST((doc_id div 20) % 20 AS INT)").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    edges.foreach { case (a, b) =>
      (rows.get(a), rows.get(b)) match {
        case (Some(da), Some(db)) =>
          assert(math.abs(da - db) <= 1, s"edge ($a,$b): $da vs $db")
        case _ => () // a node unreached within 6 hops has no layer bound
      }
    }
  }

  test("q85: the lateral subquery decorrelates (window top-k, no loop)") {
    val df = SparkEntry.queries("q85_lateral_topn")(spark, sf0_001)
    val physical = df.queryExecution.executedPlan.toString
    // DecorrelateInnerQuery rewrites ORDER BY+LIMIT per group into a
    // partitioned window (rank/row_number filter) — the plan must show a
    // Window and must NOT fall back to a cartesian/nested-loop re-execution
    assert(physical.contains("Window"), s"no Window in plan:\n$physical")
    assert(!physical.contains("CartesianProduct"),
      "lateral fell back to a cartesian product")
    // and the answer is the window answer
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(spark, sf0_001)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .join(Tables.nation(spark, sf0_001),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("n_name"), col("c_acctbal").desc, col("c_custkey"))
        .collect().toSeq
    }
    assert(df.collect().toSeq == viaWindow)
  }
}
