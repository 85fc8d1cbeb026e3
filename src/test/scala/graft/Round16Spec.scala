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

  test("st37: a pending cross-store intent heals a desynced membership store before the next fold") {
    import spark.implicits._
    import streaming.{KeyedFold, Streams}
    val root = java.nio.file.Files.createTempDirectory("r16ccf")
    val lab = root.resolve("lab").toString
    val mem = root.resolve("mem").toString
    try {
      // batch 1: two 2-node components → consistent stores
      Streams.frontierCcBatch(
        Seq((0, 1), (2, 3)).toDF("src", "dst"), lab, mem)
      assert(KeyedFold.pendingIntent(mem).isEmpty)
      // simulate the ADVICE r15 crash window: the lab write of some
      // batch landed but the mem write did not — mem loses comp 2's
      // membership rows while its intent is still pending
      val p2 = KeyedFold.touched(Seq(2).toDF("comp"), Seq("comp"))
      KeyedFold.writeIntent(mem, p2)
      p2.foreach { k =>
        graft.Publish.deleteTree(
          java.nio.file.Paths.get(mem, s"kh=$k"))
      }
      // without repair, the next merge (1-3 bridges comps 0 and 2)
      // would chase comp 2 through the gutted membership index and
      // MISS nodes 2 and 3 forever; the pending intent must heal mem
      // from lab first
      Streams.frontierCcBatch(Seq((1, 3)).toDF("src", "dst"), lab, mem)
      assert(KeyedFold.pendingIntent(mem).isEmpty,
        "the batch must clear its own intent after both writes")
      val labGot = spark.read.parquet(lab).drop("kh")
        .as[(Int, Int)].collect().toMap
      assert(labGot == Map(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 0),
        s"labels under-merged — the chase missed healed members: $labGot")
      val memGot = spark.read.parquet(mem).drop("kh")
        .select(col("comp"), col("node")).as[(Int, Int)].collect().toSet
      assert(memGot == Set((0, 0), (0, 1), (0, 2), (0, 3)),
        s"membership index diverged from the inverted labels: $memGot")
    } finally graft.Publish.deleteTree(root)
  }

  test("x231: the three-stage waterfall composes in pipeline order — stage 3 never re-counts stage-2 casualties") {
    import spark.implicits._
    val T = graft.operators.Tokens
    val D = graft.operators.Dedup
    // doc 0 (A): x0 s1..s18 x1; doc 1 (A): EXACT copy (stage-1 drop);
    // doc 2 (B): same but last token y1 — 3-shingle Jaccard 17/19 ≈
    // 0.89, a stage-2 NEAR-dup casualty (keep-min keeps doc 0);
    // doc 4 (C): w0 s1..s8 w1 — shares an 8-token span with doc 0
    // (Jaccard 6/20 = 0.3: survives stage 2) → stage-3 cut of 8.
    // If stage 3 ran on the STAGE-1 survivors, doc 2's 18-token shared
    // span would add phantom cut mass to B on top of its near-dup
    // removal — the composition this pin guards.
    val span = (1 to 18).map("s" + _)
    val t0 = "x0" +: span :+ "x1"
    val t2 = "x0" +: span :+ "y1"
    val t4 = "w0" +: span.take(8) :+ "w1"
    val docs = Seq(
      (0L, t0.mkString(" "), "A"),
      (1L, t0.mkString(" "), "A"),
      (2L, t2.mkString(" "), "B"),
      (4L, t4.mkString(" "), "C"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
    val tok = Seq(0L -> t0, 1L -> t0, 2L -> t2, 4L -> t4)
      .flatMap { case (d, ts) =>
        ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
      }.toDF("doc_id", "i", "word")
    // stage 2 through the REAL x39 chain (banding + cap + exact-Jaccard
    // verify over the stage-1 survivor signatures) — fixture guard first:
    // the deterministic portable hashes must band docs 0 and 2 together
    val surv = T.survivors(docs)
    val ndCas = D.neardupCasualties(
      D.portableSigs(docs.join(surv, "doc_id")))
    assert(ndCas.collect().map(_.getLong(0)).toSet == Set(2L),
      "fixture broke: stage 2 must remove exactly doc 2")
    val surv2Tok = tok.join(
      surv.join(ndCas, Seq("doc_id"), "left_anti"), "doc_id")
    val got = T.waterfallFrom(docs, tok, ndCas,
        T.suffixLcpFrom(surv2Tok))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = got("A"); val b = got("B"); val c = got("C")
    assert(a.getAs[Long]("tokens_raw") == 40L &&
      a.getAs[Long]("doc_dup_tokens") == 20L &&
      a.getAs[Long]("neardup_tokens") == 0L &&
      a.getAs[Long]("substring_cut_tokens") == 0L &&
      a.getAs[Long]("tokens_final") == 20L, s"source A diverged: $a")
    assert(b.getAs[Long]("tokens_raw") == 20L &&
      b.getAs[Long]("doc_dup_tokens") == 0L &&
      b.getAs[Long]("neardup_tokens") == 20L &&
      b.getAs[Long]("substring_cut_tokens") == 0L &&
      b.getAs[Long]("tokens_final") == 0L, s"source B diverged: $b")
    assert(c.getAs[Long]("tokens_raw") == 10L &&
      c.getAs[Long]("doc_dup_tokens") == 0L &&
      c.getAs[Long]("neardup_tokens") == 0L &&
      c.getAs[Long]("substring_cut_tokens") == 8L &&
      c.getAs[Long]("tokens_final") == 2L, s"source C diverged: $c")

    // st39 cross-batch pin: the same corpus folded as TWO micro-batches
    // that SPLIT both the exact-dup pair (0 | 1) and the near-dup pair
    // (0 | 2) across batches — the per-doc metadata and signature folds
    // are purely additive, so the serve's stage decisions must equal
    // the batch plan's row-for-row.
    val batches = Seq(docs.filter(col("doc_id").isin(0L, 4L)),
      docs.filter(col("doc_id").isin(1L, 2L)))
    val mdFold = batches.map(_.select(col("doc_id"), col("source"),
        md5(col("text")).as("h"),
        size(graft.functions.Text.tokens(col("text"))).cast("long")
          .as("ntok")))
      .reduce(_ unionByName _)
    val sigFold = batches.map(D.portableSigs(_)).reduce(_ unionByName _)
    val surv2 = mdFold.groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val ndCas2 = D.neardupCasualties(sigFold.join(surv2, "doc_id"))
    val got2 = T.waterfallRollup(mdFold, ndCas2,
        T.suffixLcpFrom(tok.join(
          surv2.join(ndCas2, Seq("doc_id"), "left_anti"), "doc_id")))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("doc_dup_tokens"), r.getAs[Long]("neardup_tokens"),
          r.getAs[Long]("substring_cut_tokens"),
          r.getAs[Long]("tokens_final"))).toMap
    val want2 = got.view.mapValues(r =>
      (r.getAs[Long]("doc_dup_tokens"), r.getAs[Long]("neardup_tokens"),
        r.getAs[Long]("substring_cut_tokens"),
        r.getAs[Long]("tokens_final"))).toMap
    assert(got2 == want2,
      s"cross-batch folded waterfall diverged from batch: $got2 vs $want2")
  }
}
