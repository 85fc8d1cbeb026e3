package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 pins: the empty-validation-split fallback (ADVICE r14 — the
  * shipped-model family must degrade to the fixed budget, not abort),
  * the raised suffix-oracle bound (book-length documents through the
  * exact production plan, brute-force parity past the old 8192-token
  * guard), and the frontier-chase CC fold's read-pruning contract.
  */
class Round15Spec extends AnyFunSuite {
  import SparkTestSession._

  /** Index-based brute-force adjacent-LCP: sort suffix HANDLES with a
    * comparator that walks the token arrays in place (never materializes
    * a suffix — the r14 bruteLcp's drop(i) copies would be O(n²) memory
    * at book length), ordering exactly like the engine's rank order
    * (lexicographic tokens, prefix < extension, ties by (doc_id, i)),
    * then LCP each adjacent pair by direct comparison. */
  private def bruteLcpIdx(docs: Seq[(Long, Array[String])])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val byDoc = docs.toMap
    val sufs = (for {
      (d, toks) <- docs
      i <- toks.indices
    } yield (d, i)).toArray
    val ord = new Ordering[(Long, Int)] {
      def compare(a: (Long, Int), b: (Long, Int)): Int = {
        val ta = byDoc(a._1); val tb = byDoc(b._1)
        var i = a._2; var j = b._2
        while (i < ta.length && j < tb.length) {
          val c = ta(i).compareTo(tb(j))
          if (c != 0) return c
          i += 1; j += 1
        }
        val lc = java.lang.Integer.compare(ta.length - a._2,
          tb.length - b._2)
        if (lc != 0) lc
        else {
          val dc = java.lang.Long.compare(a._1, b._1)
          if (dc != 0) dc else java.lang.Integer.compare(a._2, b._2)
        }
      }
    }
    val sorted = sufs.sorted(ord)
    sorted.zip(sorted.tail).map { case ((ad, ai), (bd, bi)) =>
      val ta = byDoc(ad); val tb = byDoc(bd)
      var l = 0
      while (ai + l < ta.length && bi + l < tb.length &&
        ta(ai + l) == tb(bi + l)) l += 1
      (ad, ai.toLong, bd, bi.toLong, l.toLong)
    }.toSeq
  }

  test("suffix LCP handles book-length documents past the old 8192-token oracle bound") {
    // VERDICT r14 item 1: the r14 guard aborted the seven-consumer slcp
    // family on any >8192-token document; SuffixRounds = 17 moves the
    // oracle bound to 131072 tokens. This drives a 9000-token document
    // (past the OLD bound — the r14 require would have thrown) through
    // the exact production plan and pins it against brute force.
    val rng = new scala.util.Random(1507)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k")
    def rnd(n: Int) = Array.fill(n)(vocab(rng.nextInt(vocab.length)))
    val phrase = rnd(25)
    val book = rnd(9000)
    Array.copy(phrase, 0, book, 500, 25)
    Array.copy(phrase, 0, book, 7200, 25)
    val small = rnd(80)
    Array.copy(phrase, 0, small, 30, 25)
    val docs: Seq[(Long, Array[String])] =
      Seq(0L -> book, 1L -> small, 2L -> rnd(7))
    import spark.implicits._
    val tok = docs.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "word")
    val got = operators.Tokens.suffixLcpFrom(tok)
      .select("ad", "ai", "bd", "bi", "lcp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sorted
    val want = bruteLcpIdx(docs).sorted
    assert(got.size == want.size,
      s"adjacent-pair count: got ${got.size}, want ${want.size}")
    assert(got == want, {
      val diff = got.zip(want).filter { case (g, w) => g != w }.take(5)
      s"first diverging pairs (got, want): $diff"
    })
    // the planted 25-token repeat is visible at full length
    assert(got.map(_._5).max >= 25)
  }

  test("x227: the stitched corpus makes the gram cutter's over-cut branch fire, at exactly the derived algebra") {
    // hand-derived expectation per qualifying source (VERDICT r14
    // item 3): eval E = t1..t7 stitches P = t1..t6 and Q = t2..t7
    // (gram run of 3, NO single-train-doc 7-span) -> fp = 7; eval
    // E2 = t8..t14 is verbatim in train R -> tp = 7; the window lemma
    // holds -> fn = 0. Oracle equality at three SFs proves the two
    // ENGINES agree; this pins that they agree on the RIGHT numbers.
    val rows = SparkEntry.queries("x227_stitched_gap")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("gram_tokens") == 14L &&
        r.getAs[Long]("exact_tokens") == 7L &&
        r.getAs[Long]("tp") == 7L &&
        r.getAs[Long]("fp") == 7L &&
        r.getAs[Long]("fn") == 0L &&
        r.getAs[Long]("precision_ppm") == 500000L &&
        r.getAs[Long]("recall_ppm") == 1000000L,
        s"source ${r.getAs[String]("source")} diverged from the " +
          s"derived algebra: $r")
    }
  }

  test("st37: the frontier-chase fold reads only endpoint/affected-component partitions, and the chase reaches non-endpoint members") {
    import spark.implicits._
    import streaming.{KeyedFold, StateFold, Streams}
    val root = java.nio.file.Files.createTempDirectory("r15ccf")
    val lab = root.resolve("lab").toString
    val mem = root.resolve("mem").toString
    try {
      // batch 1: 40 disjoint 2-node components spread over partitions
      val b1 = (0 until 40).map(i => (2 * i, 2 * i + 1)).toDF("src", "dst")
      Streams.frontierCcBatch(b1, lab, mem)
      val populated = KeyedFold.partFilesRec(lab)
        .map(_.split("/")(0)).size
      assert(populated >= 10,
        s"fixture must spread state over many partitions: $populated")
      val mark = StateFold.events.size
      // batch 2: ONE bridging edge (0,2) — endpoints {0,2}; the merge
      // must also relabel node 3 (comp 2's other member), which is NOT
      // a batch endpoint: only the mem chase can find it
      Streams.frontierCcBatch(Seq((0, 2)).toDF("src", "dst"), lab, mem)
      val evs = StateFold.events.drop(mark)
      val reads = evs.filter(_.kind == "keyed-read")
      assert(reads.nonEmpty, "the fold must take the pruned-read path")
      reads.foreach { e =>
        assert(e.before.size <= 2,
          s"a 1-edge batch read ${e.before.size} partitions of ${e.dir}: " +
            s"${e.before} — the read is not frontier-pruned")
      }
      // ... and correctness: 0,1,2,3 merged under min-label 0, every
      // other component untouched
      val got = spark.read.parquet(lab).drop("kh")
        .as[(Int, Int)].collect().toMap
      assert(Seq(0, 1, 2, 3).forall(got(_) == 0),
        s"bridge must merge both 2-node comps: $got")
      (2 until 40).foreach { i =>
        assert(got(2 * i) == 2 * i && got(2 * i + 1) == 2 * i,
          s"untouched component $i relabeled: $got")
      }
      // the membership store agrees with the label store exactly
      val inv = spark.read.parquet(mem).drop("kh")
        .select(col("node"), col("comp")).as[(Int, Int)].collect().toMap
      assert(inv == got, "mem and lab diverged")
    } finally graft.Publish.deleteTree(root)
  }

  test("x228: the cross-source overlap matrix matches a hand-derived crafted corpus") {
    import spark.implicits._
    // source A doc 0 and source B doc 1 share one verbatim 9-token
    // passage (two 8-window starts on each side, one shared 8-prefix
    // class each... derived below); B doc 1 and B doc 2 ALSO repeat a
    // span — same-source, must NOT appear in the cross matrix; source C
    // shares nothing
    val shared = Array("s1", "s2", "s3", "s4", "s5", "s6", "s7", "s8", "s9")
    val d0 = Array("a1", "a2") ++ shared ++ Array("a3")
    val d1 = Array("b1") ++ shared ++ Array("b2", "b3")
    val d2 = Array("b1") ++ shared ++ Array("b4", "b5") // B-internal too
    val d3 = Array("c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8", "c9")
    val docs = Seq(0L -> d0, 1L -> d1, 2L -> d2, 3L -> d3)
    val tok = docs.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "word")
    val srcMap = Seq((0L, "A"), (1L, "B"), (2L, "B"), (3L, "C"))
      .toDF("doc_id", "source")
    val got = operators.Tokens.exactSourceOverlapFrom(
      operators.Tokens.suffixLcpFrom(tok), srcMap).collect()
    // the only cross-source pair is (A, B): a 9-token shared span has
    // two 8-window starts per occurrence; d0 carries one occurrence
    // (2 windows), B carries two (d1 + d2 = 4 windows); both window
    // contents (s1..s8, s2..s9) are single classes spanning A and B
    assert(got.length == 1, s"expected one pair row: ${got.toSeq}")
    val r = got.head
    assert(r.getAs[String]("source_a") == "A" &&
      r.getAs[String]("source_b") == "B" &&
      r.getAs[Long]("shared_classes") == 2L &&
      r.getAs[Long]("windows_a") == 2L &&
      r.getAs[Long]("windows_b") == 4L,
      s"matrix diverged from the derived algebra: $r")
  }

  test("x230: the derived locality corpus fires both branches at the hand-derived split, incl. the content-level discriminator") {
    // per qualifying source: d0 = t1..t8 ×2 (same-doc repeat → intra
    // 16); d1 = d2 = t9..t16 (cross-doc → inter 16); d3 = t17..t24 ×2
    // with d4 = t17..t24 — d3's copies are same-doc but the content
    // also lives in d4, so ALL 24 of those tokens must count inter (a
    // neighbor-adjacency test would misfile d3's first copy; the class
    // doc-cardinality test cannot). 56 total / 40 inter / 16 intra.
    val rows = SparkEntry.queries("x230_derived_locality")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_tokens") == 56L &&
        r.getAs[Long]("covered_tokens") == 56L &&
        r.getAs[Long]("inter_tokens") == 40L &&
        r.getAs[Long]("intra_tokens") == 16L &&
        r.getAs[Long]("inter_ppm") == 714285L &&
        r.getAs[Long]("intra_ppm") == 285714L,
        s"source ${r.getAs[String]("source")} diverged from the " +
          s"derived locality algebra: $r")
    }
  }

  test("st37: a membership partition whose every row relabels away is CLEARED, not left stale") {
    import spark.implicits._
    import streaming.{KeyedFold, Streams}
    // r15 review: dynamic partition overwrite only replaces partitions
    // present in the written data, so a touched-but-now-empty partition
    // kept its stale files. Fixture: comp 5 = {5,6} alone in its kh
    // partition; merging it into comp 0 = {0,1} must empty kh(5).
    val kh5 = Seq(Tuple1(5)).toDF("c")
      .select(KeyedFold.kh(Seq(col("c")))).head.getInt(0)
    val kh0 = Seq(Tuple1(0)).toDF("c")
      .select(KeyedFold.kh(Seq(col("c")))).head.getInt(0)
    assert(kh5 != kh0, "fixture needs the two comps in distinct partitions")
    val root = java.nio.file.Files.createTempDirectory("r15ccm")
    val lab = root.resolve("lab").toString
    val mem = root.resolve("mem").toString
    try {
      Streams.frontierCcBatch(Seq((0, 1), (5, 6)).toDF("src", "dst"),
        lab, mem)
      Streams.frontierCcBatch(Seq((0, 5)).toDF("src", "dst"), lab, mem)
      val gotMem = spark.read.parquet(mem).drop("kh")
        .select(col("comp"), col("node")).as[(Int, Int)].collect().toSet
      assert(gotMem == Set((0, 0), (0, 1), (0, 5), (0, 6)),
        s"stale membership rows survived the merge: $gotMem")
      assert(KeyedFold.partFilesIn(mem, Seq(kh5)).isEmpty,
        "the emptied kh partition must be cleared on disk")
      val gotLab = spark.read.parquet(lab).drop("kh")
        .select(col("node"), col("comp")).as[(Int, Int)].collect().toMap
      assert(gotLab == Map(0 -> 0, 1 -> 0, 5 -> 0, 6 -> 0), s"$gotLab")
    } finally graft.Publish.deleteTree(root)
  }

  test("st37: one batch chaining 51 prior components converges (data-derived rounds, not a fixed count)") {
    import spark.implicits._
    import streaming.Streams
    // r15 review: ccLabels(cg, 4) covers ~30-link chains; this batch's
    // contraction graph is a 51-node path (diameter 50), which a fixed
    // 4-round converger silently under-labels.
    val root = java.nio.file.Files.createTempDirectory("r15ccc")
    val lab = root.resolve("lab").toString
    val mem = root.resolve("mem").toString
    try {
      Streams.frontierCcBatch(
        (0 until 51).map(i => (2 * i, 2 * i + 1)).toDF("src", "dst"),
        lab, mem)
      Streams.frontierCcBatch(
        (0 until 50).map(i => (2 * i + 1, 2 * i + 2)).toDF("src", "dst"),
        lab, mem)
      val got = spark.read.parquet(lab).drop("kh")
        .select(col("node"), col("comp")).as[(Int, Int)].collect()
      assert(got.length == 102)
      got.foreach { case (n, c) =>
        assert(c == 0, s"node $n under-converged to comp $c (want 0)")
      }
    } finally graft.Publish.deleteTree(root)
  }

  test("x231: the waterfall composes in pipeline order — stage 2 never re-counts stage-1 casualties") {
    import spark.implicits._
    // doc 0 (A): x0 s1..s8 x1; doc 1 (A): EXACT copy (stage-1 drop);
    // doc 2 (B): y0 s1..s8 y1 (stage-2 cut, keep-first in doc 0).
    // If stage 2 ran on the RAW corpus, doc 1's copy of the span would
    // add phantom cut mass to A — the composition this pin guards.
    val span = (1 to 8).map("s" + _)
    val t0 = "x0" +: span :+ "x1"
    val t2 = "y0" +: span :+ "y1"
    val docs = Seq(
      (0L, t0.mkString(" "), "A"),
      (1L, t0.mkString(" "), "A"),
      (2L, t2.mkString(" "), "B")).toDF("doc_id", "text", "source")
    val tok = Seq(0L -> t0, 1L -> t0, 2L -> t2).flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "word")
    val survTok = tok.join(
      operators.Tokens.survivors(docs), "doc_id")
    // stage 2 receives an explicitly EMPTY casualty set here: this pin
    // isolates the stage-1 → stage-3 composition (Round16Spec pins the
    // three-stage form with a firing middle stage)
    val got = operators.Tokens.waterfallFrom(docs, tok,
        docs.select(col("doc_id")).limit(0),
        operators.Tokens.suffixLcpFrom(survTok))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = got("A"); val b = got("B")
    assert(a.getAs[Long]("tokens_raw") == 20L &&
      a.getAs[Long]("doc_dup_tokens") == 10L &&
      a.getAs[Long]("substring_cut_tokens") == 0L &&
      a.getAs[Long]("tokens_final") == 10L,
      s"source A diverged: $a")
    assert(b.getAs[Long]("tokens_raw") == 10L &&
      b.getAs[Long]("doc_dup_tokens") == 0L &&
      b.getAs[Long]("substring_cut_tokens") == 8L &&
      b.getAs[Long]("tokens_final") == 2L,
      s"source B diverged: $b")
  }

  test("validated trainer: empty validation split falls back to the fixed budget instead of aborting") {
    import spark.implicits._
    // a tiny corpus whose docs all land OUTSIDE the val bucket by
    // construction: pass the splits explicitly — train non-empty,
    // val EMPTY (the exact shape ADVICE r14 flagged: every doc's
    // fingerprint bucket misses [80,90))
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six seven eight"),
      (2L, "alpha two gamma four epsilon six"))
      .toDF("doc_id", "text")
    val cells = operators.Quality.featureCells(docs)
    val labels = operators.Quality.labelTable(docs)
    val empty = docs.limit(0)
    val (curve, weights) = operators.Quality.trainValidated(
      cells, labels,
      operators.Quality.featureCells(empty),
      operators.Quality.labelTable(empty))
    val rows = curve.orderBy(col("round")).collect()
    assert(rows.length == operators.Quality.Epochs)
    // no early stop without evidence: the LAST round is chosen, the
    // curve carries val_n = 0 and val_accuracy = 0.0 (never NaN)
    val chosen = rows.filter(_.getAs[Int]("chosen") == 1)
    assert(chosen.length == 1 &&
      chosen.head.getAs[Int]("round") == operators.Quality.Epochs,
      s"fallback must choose the fixed budget: ${chosen.toSeq}")
    assert(rows.forall(r => r.getAs[Long]("val_n") == 0L &&
      r.getAs[Double]("val_accuracy") == 0.0))
    // ... and the weights are the fixed-budget trainer's, exactly
    val fixed = operators.Quality.trainFromCells(cells, labels)
    assert(weights.join(fixed, Seq("b", "w"), "full_outer").count() ==
      fixed.count(), "fallback weights must equal the fixed-budget run")
  }
}
