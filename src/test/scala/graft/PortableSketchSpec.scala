package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Property pins for the round's portable-sketch twins (x63 SimHash, x64
  * sampled quantiles). The DuckDB oracle checks cross-engine VALUE parity
  * per round; these pin the structural claims the hash-equality alone
  * wouldn't name: identical texts collapse to identical signatures, and
  * the salted two-level bottom-k selection is exactly the global one
  * (the at-scale claim x64's comment makes). */
class PortableSketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("x63: identical token sets -> identical bit vectors, dist 0, neardup") {
    // SimHash keys on the DISTINCT token set: two docs with equal sets
    // share every per-token vote, so their 32 bits agree bit for bit;
    // the fixture's planted near-dups (equal sets, reshuffled order)
    // must surface at hamming distance 0 and be flagged.
    val docs = Tables.documents(spark, sf0_001)
      .select(col("doc_id"),
        md5(concat_ws("|",
          array_sort(array_distinct(split(col("text"), " "))))).as("h"))
    val dupPair = docs.as("a")
      .join(docs.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .limit(1).collect()
    assert(dupPair.nonEmpty, "fixture has at least one equal-token-set pair")
    val (da, db) = (dupPair.head.getLong(0), dupPair.head.getLong(1))
    val bits = Dedup.psimhashBits(spark, sf0_001)
      .filter(col("doc_id").isin(da, db))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    (0 until 32).foreach { i =>
      assert(bits((da, i)) == bits((db, i)), s"bit $i differs for ($da,$db)")
    }
    // and the query flag/fingerprint invariants hold on every output row
    val rows = SparkEntry.queries("x63_simhash_portable")(spark, sf0_001)
      .collect()
    assert(rows.exists(_.getAs[Int]("dist") == 0), "zero-distance dups surface")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("neardup") == (r.getAs[Int]("dist") <= 3))
      if (r.getAs[Int]("dist") == 0)
        assert(r.getAs[Long]("fp_a") == r.getAs[Long]("fp_b"))
    }
  }

  test("x64: salted two-level bottom-k == single global window bottom-k") {
    val ev = Tables.events(spark, sf0_001)
      .select(col("event_type"), col("event_id"), col("value"))
      .filter(col("value").isNotNull)
    val pv = ev
      .withColumn("a", expr("event_id & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .withColumn("pri", expr("shiftright(a, 16) ^ a"))
      .drop("a")
    val twoLevel = TextAnalysis.quantileSample(pv, 64)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val global = pv
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("pri"), col("event_id"))))
      .filter(col("rn") <= 64)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(twoLevel == global)
    assert(global.groupBy(_._1).forall(_._2.size == 64))
  }

  test("x64: bottom-k sample is mergeable (union of split bottom-k's)") {
    // split the stream arbitrarily (event_id parity), take bottom-64 of
    // each half, merge, take bottom-64 again == direct global bottom-64 —
    // the property that lets executors fold partitions independently.
    val ev = Tables.events(spark, sf0_001)
      .select(col("event_type"), col("event_id"), col("value"))
      .filter(col("value").isNotNull)
    val pv = ev
      .withColumn("a", expr("event_id & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .withColumn("pri", expr("shiftright(a, 16) ^ a"))
      .drop("a")
    def bottomK(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("pri"), col("event_id"))))
      .filter(col("rn") <= 64).drop("rn")
    val merged = bottomK(
      bottomK(pv.filter(col("event_id") % 2 === 0))
        .unionByName(bottomK(pv.filter(col("event_id") % 2 === 1))))
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = bottomK(pv)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged == direct)
  }

  test("x63: vote votes are balanced-ish (mixer avalanche reaches the low bit)") {
    // a degenerate mixer (all votes +1) would set every bit to 1 and
    // collapse all docs into one bucket; pin that both vote signs occur
    // in fair proportion over the vocabulary.
    val bits = Dedup.psimhashBits(spark, sf0_001)
    val n = bits.count()
    val ones = bits.filter(col("b") === 1).count()
    assert(ones > n / 4 && ones < 3 * n / 4, s"ones=$ones of $n")
  }
}
