package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the event-analytics batch (q77–q80). Values are
  * oracle-checked; these pin the invariants a passing hash doesn't
  * explain. */
class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._
  import PlanWalk._

  test("q77 funnel: stages are strictly ordered and monotonically shrinking") {
    val rows = SparkEntry.queries("q77_funnel")(spark, sf0_001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val view = r.getAs[Long]("view_us")
      val click = Option(r.get(r.fieldIndex("click_us"))).map(_.asInstanceOf[Long])
      val buy = Option(r.get(r.fieldIndex("buy_us"))).map(_.asInstanceOf[Long])
      // strict stage ordering: view < click < buy where present
      click.foreach(c => assert(c > view))
      (click, buy) match {
        case (Some(c), Some(b)) => assert(b > c)
        case (None, Some(_)) => fail("purchase stage without click stage")
        case _ => ()
      }
      // stage is consistent with which timestamps exist
      val stage = r.getAs[Long]("stage")
      assert(stage == (if (buy.isDefined) 3 else if (click.isDefined) 2 else 1))
    }
  }

  test("q78 retention: offset-0 retention is 1.0 and n_active never exceeds the cohort") {
    val rows = SparkEntry.queries("q78_retention_cohorts")(spark, sf0_001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
      if (r.getAs[Long]("offset_w") == 0L)
        assert(r.getAs[Double]("retention") == 1.0,
          "every cohort member is active in their own first week")
    }
  }

  test("q79 scd2: per-user intervals chain (valid_to = next valid_from) and never overlap") {
    val rows = SparkEntry.queries("q79_scd2_history")(spark, sf0_001).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, hist) =>
      val sorted = hist.sortBy(_.getAs[Long]("valid_from_us")).toSeq
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.get(a.fieldIndex("valid_to_us")) ==
            b.getAs[Long]("valid_from_us"), "gap or overlap in SCD2 chain")
          // consecutive versions must differ (change rows only)
          assert(a.getAs[String]("tier") != b.getAs[String]("tier"))
        case _ => ()
      }
      // exactly one open (current) version per user
      assert(sorted.count(r => r.isNullAt(r.fieldIndex("valid_to_us"))) == 1)
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")))
    }
  }

  test("q80 triangles: canonical x<y<z, all three edges exist, no cartesian in the plan") {
    val df = SparkEntry.queries("q80_triangles")(spark, sf0_001)
    val nodes = executedAll(df)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    val tris = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(tris.forall { case (x, y, z) => x < y && y < z })
    assert(tris.distinct.length == tris.length)
  }

  test("q77/q79 epoch-micros outputs agree with the ns-truncation contract") {
    // the q34 contract: ns fixture → micros via exact integer div; any row's
    // micros must reconstruct the ns value within 999ns
    val ev = Tables.events(spark, sf0_001)
      .filter(col("event_type") === "view")
      .agg(min(unix_micros(col("ts")))).collect()(0).getLong(0)
    val out = SparkEntry.queries("q77_funnel")(spark, sf0_001)
      .agg(min(col("view_us"))).collect()(0).getLong(0)
    assert(out >= ev, "funnel view_us cannot precede the corpus-min view ts")
  }
}
