package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Pins x56's prefix-filtering CLAIM (the oracle proves the answer is
  * right; this proves the candidate set is genuinely smaller than x04's
  * full inverted-index co-occurrence on the same fixture — the reason the
  * operator exists). */
class PrefixJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("x56: prefix candidates are a strict subset of full co-occurrence") {
    val sets = Tables.documents(spark, sf0_001)
      .select(col("doc_id"), Text.shingles(col("text"), 3).as("tri"))
      .select(col("doc_id"), col("tri"), size(col("tri")).as("sz"))
      .filter(col("sz") > 0)
      .localCheckpoint()
    val grams = sets.select(col("doc_id"), col("sz"), explode(col("tri")).as("g"))

    // full inverted-index candidate pairs (x04's generation, unblocked)
    val full = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()

    // x56's prefix-filtered candidate pairs
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val prefix = grams.join(df, "g")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .filter(col("rn") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          lit(5) * least(col("a.sz"), col("b.sz")) >=
            lit(4) * greatest(col("a.sz"), col("b.sz")))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()

    assert(cand < full,
      s"prefix filtering must shrink the candidate set ($cand vs $full)")
    assert(cand > 0, "fixture has near-duplicate candidates")

    // and no true pair is lost: every J >= 1/2 pair (integer predicate)
    // appears in the operator's output
    val out = SparkEntry.queries("x56_prefix_join")(spark, sf0_001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("i", size(array_intersect(col("a.tri"), col("b.tri"))))
      .filter(lit(9) * col("i") >= lit(4) * (col("a.sz") + col("b.sz")))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == brute, "prefix join misses or invents pairs vs brute force")
  }
}
