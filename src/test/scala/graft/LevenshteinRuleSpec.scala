package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.plans.LevenshteinThresholdRewrite]]: the rewrite fires on
  * threshold comparisons (bare and long-cast), is semantics-preserving
  * against a Scala-computed ground truth (incl. the k=0 boundary and
  * unsatisfiable k<... forms), and leaves non-threshold uses alone. */
class LevenshteinRuleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      Seq(graft.plans.LevenshteinThresholdRewrite)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  private val pairs = Seq(
    ("kitten", "sitting"),   // dist 3
    ("flaw", "lawn"),        // dist 2
    ("same", "same"),        // dist 0
    ("a", "abcdefgh"),       // dist 7 — length gap prunes at k<7
    ("spark", "sparks"))     // dist 1
    .toDF("a", "b")

  private def lev(x: String, y: String): Int = {
    val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  test("rewrite fires: the optimized filter carries a banded (3-arg) levenshtein") {
    withRule {
      // parquet-backed source: a local Seq would be constant-folded into a
      // LocalRelation before the filter survives to be inspected
      val docs = Tables.documents(spark, sf0_001)
      val df = docs.select(col("doc_id"), substring(col("text"), 1, 20).as("a"))
        .join(docs.select(col("doc_id").as("id2"),
          substring(col("text"), 1, 20).as("b")), col("doc_id") < col("id2"))
        .filter(levenshtein(col("a"), col("b")) <= 2)
      val banded = df.queryExecution.optimizedPlan.flatMap(_.expressions).flatMap(_.collect {
        case l: Levenshtein if l.threshold.isDefined => l
      })
      assert(banded.nonEmpty, s"no banded levenshtein in:\n${df.queryExecution.optimizedPlan}")
      val full = df.queryExecution.optimizedPlan.flatMap(_.expressions).flatMap(_.collect {
        case l: Levenshtein if l.threshold.isEmpty => l
      })
      assert(full.isEmpty, "thresholdless levenshtein survived in the filter")
    }
  }

  test("rewrite fires on x47's own cast form") {
    withRule {
      val df = SparkEntry.queries("x47_edit_neardup")(spark, sf0_001)
      val banded = df.queryExecution.optimizedPlan.flatMap(_.expressions).flatMap(_.collect {
        case l: Levenshtein if l.threshold.isDefined => l
      })
      assert(banded.nonEmpty,
        s"x47's dist<=30 did not rewrite:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("rewrite is semantics-preserving for <=, <, and the cast form, k = 0..4") {
    val expected = pairs.collect().map(r => (r.getString(0), r.getString(1)))
      .map { case (a, b) => (a, b, lev(a, b)) }
    withRule {
      for (k <- 0 to 4) {
        val le = pairs.filter(levenshtein(col("a"), col("b")) <= k)
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(le == expected.filter(_._3 <= k).map(t => (t._1, t._2)).toSet,
          s"<= $k mismatch")
        val lt = pairs.filter(levenshtein(col("a"), col("b")) < k)
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(lt == expected.filter(_._3 < k).map(t => (t._1, t._2)).toSet,
          s"< $k mismatch")
        val cast = pairs
          .filter(levenshtein(col("a"), col("b")).cast("long") <= k.toLong)
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(cast == expected.filter(_._3 <= k).map(t => (t._1, t._2)).toSet,
          s"cast <= $k mismatch")
      }
    }
  }

  test("non-threshold uses are untouched: projected distances stay exact") {
    withRule {
      val out = pairs
        .select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("d"))
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getInt(2))).toMap
      assert(out(("kitten", "sitting")) == 3)
      assert(out(("a", "abcdefgh")) == 7)
    }
  }

  test("x47 still matches itself under the rule (end-to-end equivalence)") {
    val base = SparkEntry.queries("x47_edit_neardup")(spark, sf0_001)
      .collect().map(_.toSeq).toSeq
    withRule {
      val ruled = SparkEntry.queries("x47_edit_neardup")(spark, sf0_001)
        .collect().map(_.toSeq).toSeq
      assert(ruled == base)
    }
  }
}
