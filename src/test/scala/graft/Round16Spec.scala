package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins: st38's dual-arm contamination serve on a crafted
  * cross-batch corpus (VERDICT r15 item 1 — a train/eval pair split
  * across micro-batches must be caught by the FRESH gram arm before any
  * exact rebuild, with recall 1, and collapse to the exact answer once
  * the cadence rebuild covers the converged stream).
  */
class Round16Spec extends AnyFunSuite {
  import SparkTestSession._

  test("st38: the dual-arm serve catches cross-batch contamination before the rebuild (fn = 0) and equals the exact report after it") {
    import spark.implicits._
    val T = graft.operators.Tokens
    val M = graft.operators.Mining

    // crafted corpus, two "micro-batches":
    //   batch 1 — T0 (train): b1..b9          E  (eval): a1..a9
    //   batch 2 — T1 (train): a1..a7 x1 x2    E2 (eval): b1..b7 y1 y2
    //             E3 (eval): z1..z8 (clean)
    // The slcp artifact is as-of batch 1, where NO contamination exists.
    // Mid-cadence, the fresh arm must flag BOTH directions the stale arm
    // cannot see: new-train×old-eval (T1 ⊃ E's a1..a7) and
    // new-eval×old-train (E2 ⊃ T0's b1..b7).
    def toks(p: String, n: Int): String =
      (1 to n).map(k => s"$p$k").mkString(" ")
    val docs = Seq(
      (0L, toks("b", 9), true), // T0, batch 1
      (1L, toks("a", 9), false), // E, batch 1
      (2L, toks("a", 7) + " x1 x2", true), // T1, batch 2
      (3L, toks("b", 7) + " y1 y2", false), // E2, batch 2
      (4L, toks("z", 8), false) // E3, batch 2
    ).toDF("doc_id", "text", "is_train")
    val split = docs.select(col("doc_id"), col("is_train"))
    val tokOf = docs.select(col("doc_id"),
      posexplode(graft.functions.Text.tokens(col("text")))
        .as(Seq("i", "word")))

    // st38's folded state, via the SHARED gram pass
    val cg = M.contamGramsSplit(docs).localCheckpoint()
    val tg = cg.filter(col("is_train")).select(col("doc_id"), col("g"))
      .distinct()
    val eg = cg.filter(!col("is_train"))
      .select(col("doc_id"), col("pos"), col("g"))
    val base = docs.filter(!col("is_train"))
      .select(col("doc_id"),
        size(graft.functions.Text.tokens(col("text"))).cast("long")
          .as("n_tokens"))

    // STALE exact arm: artifact as-of batch 1 only — its frontier must
    // be EMPTY (T0 and E share nothing), so the stale arm alone would
    // miss both contaminations below.
    val batch1Tok = tokOf.filter(col("doc_id") < 2)
    val hpStale = T.exactContamFrontier(
      T.islandMembers(T.suffixLcpFrom(batch1Tok), 7), split)
    assert(hpStale.count() == 0L,
      "fixture broke: the as-of-batch-1 exact frontier must be empty")
    val asOfStale = Seq(0L, 1L).toDF("doc_id")

    def rows(df: org.apache.spark.sql.DataFrame)
        : Seq[(Long, Long, Long, Long, Long, Boolean)] =
      df.collect().toSeq.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("contam_tokens"), r.getAs[Long]("contam_ppm"),
        r.getAs[Boolean]("contaminated"))).sortBy(_._1)

    // MID-CADENCE serve: both fresh branches fire at the hand-derived
    // algebra — E (old eval) via T1's new train grams (run of 3 → span
    // [0,7) → 7 tokens), E2 (new eval) via the full train set (same
    // shape), E3 clean. 7 * 1e6 div 9 = 777777.
    val mid = rows(T.dualArmContam(hpStale, asOfStale, tg, eg, base))
    assert(mid == Seq(
      (1L, 9L, 1L, 7L, 777777L, true),
      (3L, 9L, 1L, 7L, 777777L, true),
      (4L, 8L, 0L, 0L, 0L, false)),
      s"mid-cadence dual-arm serve diverged from the derived algebra: $mid")

    // CONVERGED serve: rebuild the exact arm over the whole corpus; the
    // fresh branches are now empty by construction and the combine must
    // equal the pure exact x225-shape report — and (this corpus has no
    // gram over-cut) the mid-cadence answer, proving fn = 0 held.
    val hpConv = T.exactContamFrontier(
      T.islandMembers(T.suffixLcpFrom(tokOf), 7), split)
    val asOfAll = docs.select(col("doc_id"))
    val conv = rows(T.dualArmContam(hpConv, asOfAll, tg, eg, base))
    val exact = rows {
      val merged = M.mergeSpans(hpConv.select(col("doc_id"),
        col("i").as("s0"), (col("i") + 7).as("e0")))
      base.join(merged, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("tokens_removed"), lit(0L)).as("contam_tokens"),
          expr("coalesce(tokens_removed, 0) * 1000000 div n_tokens")
            .as("contam_ppm"),
          (coalesce(col("tokens_removed"), lit(0L)) > 0)
            .as("contaminated"))
    }
    assert(conv == exact,
      s"converged dual-arm serve must equal the exact report: $conv vs $exact")
    assert(conv == mid,
      s"recall-1 contract broke: mid-cadence $mid vs converged $conv")
  }
}
