package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Text, VectorSum}

/** The VectorSum aggregator and the vocab-broadcast simhash path must agree
  * exactly with the per-document Text.simhashBits definition. */
class VectorSumSpec extends AnyFunSuite {
  import SparkTestSession._

  test("VectorSum sums elementwise with partial aggregation") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)), (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(5L, 5L, 5L))
    ).toDF("k", "v").repartition(4) // force partials + merge
    val got = df.groupBy("k").agg(VectorSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(11L, 22L, 33L) && got(2L) == Seq(5L, 5L, 5L))
  }

  test("vocab-broadcast simhash equals the per-document definition") {
    val docs = Tables.documents(spark, sf0_001).limit(100)
    val direct = docs.select(col("doc_id"),
      Text.simhashValue(Text.simhashBits(col("text"))).as("sh"))
    val docToks = docs.select(col("doc_id"),
      explode(array_distinct(Text.tokens(col("text")))).as("tok"))
    val vocab = docToks.select(col("tok")).distinct()
      .withColumn("tbits", transform(sequence(lit(0), lit(63)),
        i => pmod(xxhash64(concat(col("tok"), lit("#"), i.cast("string"))),
          lit(2L)) * 2L - 1L))
    val viaVocab = docToks.join(broadcast(vocab), "tok")
      .groupBy(col("doc_id"))
      .agg(VectorSum(col("tbits")).as("votes"))
      .select(col("doc_id"), Text.simhashValue(
        transform(col("votes"), v => when(v > 0, 1L).otherwise(0L))).as("sh"))
    assert(direct.exceptAll(viaVocab).isEmpty && viaVocab.exceptAll(direct).isEmpty)
  }
}
