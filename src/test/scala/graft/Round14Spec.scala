package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 pins: the suffix machinery's data-driven round count
  * (documents past the old 128-token cap, proved against an in-memory
  * brute-force suffix sort), plus the degenerate-corpus guards added
  * with it.
  */
class Round14Spec extends AnyFunSuite {
  import SparkTestSession._

  /** Brute-force adjacent-LCP table over a crafted corpus: materialize
    * every suffix as a token list, sort (suffix tokens, doc_id, i)
    * exactly like the engine's rank order (rank ties break on
    * (doc_id, i) in `ordered`), then LCP each adjacent pair. O(n² log n)
    * on purpose — an independent implementation the relational
    * prefix-doubling plan must reproduce. */
  private def bruteLcp(docs: Seq[(Long, Array[String])])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val sufs = for {
      (d, toks) <- docs
      i <- toks.indices
    } yield (d, i.toLong, toks.drop(i).toSeq)
    implicit val ord: Ordering[Seq[String]] = Ordering.Implicits
      .seqOrdering(Ordering.String)
    val sorted = sufs.sortBy { case (d, i, s) => (s, d, i) }
    sorted.zip(sorted.tail).map { case ((ad, ai, sa), (bd, bi, sb)) =>
      val l = sa.zip(sb).takeWhile { case (x, y) => x == y }.size
      (ad, ai, bd, bi, l.toLong)
    }
  }

  test("suffix LCP handles >128-token documents (data-driven rounds, no cap) and matches brute force") {
    // 5 docs, one of 300 tokens (old cap: require(maxTail <= 128) would
    // abort) with a planted 17-token repeat both inside the long doc and
    // across docs; tiny 11-word vocab so repeats are plentiful
    val rng = new scala.util.Random(1401)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k")
    def rnd(n: Int) = Array.fill(n)(vocab(rng.nextInt(vocab.length)))
    val phrase = rnd(17)
    val big = rnd(300)
    Array.copy(phrase, 0, big, 40, 17)
    Array.copy(phrase, 0, big, 200, 17)
    val small = rnd(60)
    Array.copy(phrase, 0, small, 10, 17)
    val docs: Seq[(Long, Array[String])] = Seq(
      0L -> big, 1L -> small, 2L -> rnd(9), 3L -> rnd(140), 4L -> rnd(1))
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
    val want = bruteLcp(docs).sorted
    assert(got.size == want.size,
      s"adjacent-pair count: got ${got.size}, want ${want.size}")
    assert(got == want, {
      val diff = got.zip(want).filter { case (g, w) => g != w }.take(5)
      s"first diverging pairs (got, want): $diff"
    })
    // the planted 17-token repeat must be visible as a max-LCP >= 17
    assert(got.map(_._5).max >= 17)
  }

  test("suffix rank round count is data-derived: ceil(log2 max tail) doubling rounds") {
    import spark.implicits._
    def roundsFor(maxLen: Int): Int = {
      val toks = (0 until maxLen).map(i => (0L, i.toLong, "w" + (i % 3)))
      operators.Tokens.suffixRankTables(toks.toDF("doc_id", "i", "word")).size
    }
    // rank tables = r0 plus one per doubling round while 2^k < maxTail
    assert(roundsFor(1) == 1)   // r0 only
    assert(roundsFor(2) == 2)   // r0, r1
    assert(roundsFor(129) == 9) // r0..r8 — past the old 7-round cap
  }

  test("x223: of three identical copies only the first survives intact") {
    import spark.implicits._
    // docs 0/1/2 are exact 12-token copies; docs 3/4 are all-unique
    // filler (tokens that appear nowhere else)
    val p = (0 until 12).map(k => s"p$k")
    val docs = Seq(
      0L -> p, 1L -> p, 2L -> p,
      3L -> (0 until 10).map(k => s"f$k"),
      4L -> (0 until 9).map(k => s"g$k"))
    val tok = docs.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "word")
    val meta = docs.map { case (d, _) => (d, s"src$d") }
      .toDF("doc_id", "source")
    val out = operators.Tokens.substringRewriteFrom(
      operators.Tokens.suffixLcpFrom(tok), tok, meta).collect()
    // the first copy is untouched -> not an affected row at all
    assert(!out.exists(_.getAs[Long]("doc_id") == 0L))
    assert(!out.exists(_.getAs[Long]("doc_id") == 3L))
    assert(!out.exists(_.getAs[Long]("doc_id") == 4L))
    // the later copies are cut token-wise to nothing
    Seq(1L, 2L).foreach { d =>
      val r = out.find(_.getAs[Long]("doc_id") == d).get
      assert(r.getAs[Long]("cut_tokens") == 12L)
      assert(r.getAs[Long]("kept_tokens") == 0L)
      assert(r.getAs[String]("kept_text") == "")
    }
  }

  test("x223: token conservation — kept + cut partitions the corpus stream") {
    import spark.implicits._
    val rng = new scala.util.Random(1402)
    val vocab = Array("a", "b", "c", "d", "e")
    def rnd(n: Int) = Array.fill(n)(vocab(rng.nextInt(vocab.length)))
    val phrase = rnd(20)
    val docs = (0L until 12L).map { d =>
      val ts = rnd(10 + rng.nextInt(60))
      // plant a 20-token repeat in every third doc (partial cuts) so the
      // conservation sum exercises both affected and untouched docs
      if (d % 3 == 0 && ts.length >= 30) Array.copy(phrase, 0, ts, 5, 20)
      d -> ts
    }
    val tok = docs.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "word")
    val meta = docs.map { case (d, _) => (d, "s") }.toDF("doc_id", "source")
    val out = operators.Tokens.substringRewriteFrom(
      operators.Tokens.suffixLcpFrom(tok), tok, meta).collect()
    assert(out.nonEmpty, "tiny-vocab fixture must produce >= 1 cut doc")
    val affected = out.map(_.getAs[Long]("doc_id")).toSet
    // per affected row: kept + cut = doc tokens, and the spliced text
    // re-tokenizes to exactly kept_tokens words
    out.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("cut_tokens")
        == r.getAs[Long]("n_tokens"))
      val kt = r.getAs[String]("kept_text")
      val n = if (kt.isEmpty) 0L else kt.split(" ", -1).length.toLong
      assert(n == r.getAs[Long]("kept_tokens"),
        s"splice drift on doc ${r.getAs[Long]("doc_id")}")
    }
    // corpus-level conservation: affected kept+cut plus untouched docs
    // sum to the full token stream
    val total = docs.map(_._2.length.toLong).sum
    val covered = out.map(r => r.getAs[Long]("kept_tokens")
        + r.getAs[Long]("cut_tokens")).sum +
      docs.filterNot(d => affected(d._1)).map(_._2.length.toLong).sum
    assert(covered == total)
  }

  test("x224: re-measured coverage collapses after the keep-first cut on the three-copy fixture") {
    import spark.implicits._
    val p = (0 until 12).map(k => s"p$k")
    val docs = Seq(
      0L -> p, 1L -> p, 2L -> p,
      3L -> (0 until 10).map(k => s"f$k"))
    val tok = docs.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "word")
    val lcp = operators.Tokens.suffixLcpFrom(tok)
    // before: copies 1 and 2 are fully covered by >=8-token repeats
    val before = operators.Tokens.coveragePerDoc(lcp).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("tokens_removed")).toMap
    assert(before.values.sum >= 24L, s"fixture must repeat: $before")
    // rewrite, then run the SAME machinery over the survivors
    val rw = operators.Tokens.rewrittenTokens(lcp, tok)
      .localCheckpoint()
    // survivors: copy 0 intact, copies 1/2 gone, filler intact
    val byDoc = rw.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(0L -> 12L, 3L -> 10L), s"survivors: $byDoc")
    // renumbering is dense from 0 per doc
    val posOk = rw.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.min("i").as("mn"),
        org.apache.spark.sql.functions.max("i").as("mx"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .collect()
    posOk.foreach { r =>
      assert(r.getAs[Long]("mn") == 0L &&
        r.getAs[Long]("mx") == r.getAs[Long]("n") - 1)
    }
    // after: no >=8-token repeat survives the cut
    val after = operators.Tokens.coveragePerDoc(
      operators.Tokens.suffixLcpFrom(rw)).collect()
    assert(after.isEmpty,
      s"no repeat may survive keep-first cutting here: ${after.toSeq}")
  }

  test("keyed fold: a batch rewrites only the kh partitions its keys touch") {
    import spark.implicits._
    import streaming.{KeyedFold, StateFold, Streams}
    val t0 = new java.sql.Timestamp(1700000000000L)
    def t(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // two source dirs: each incrementalUpsert call is one batch arrival
    // against the SAME persistent fact (a fresh stream re-reads its
    // whole source dir, so a shared dir would replay batch 1 into
    // batch 2 and touch every partition)
    val src1 = java.nio.file.Files.createTempDirectory("r14src1").toString
    val src2 = java.nio.file.Files.createTempDirectory("r14src2").toString
    val factRoot = java.nio.file.Files.createTempDirectory("r14fact")
    val fact = factRoot.resolve("fact").toString
    try {
    val keys = Seq("user_id", "event_type")
    val ord = Seq(org.apache.spark.sql.functions.col("ts").desc,
      org.apache.spark.sql.functions.col("event_id").desc)
    def dump(dir: String,
        rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
    // batch 1 spreads keys over several partitions; batch 2 touches ONE
    dump(src1, (1L to 40L).map(u => (u, t(0), u, "click", 1.0)))
    Streams.incrementalUpsert(spark, src1, fact, keys, ord)
    // the untouched-partition proof snapshots the whole tree TEST-SIDE
    // (since r15 the production journal lists only touched subdirs —
    // ADVICE r14: no full state walk in the per-batch path)
    val treeBefore = KeyedFold.partFilesRec(fact)
    dump(src2, Seq((100L, t(9), 7L, "click", 2.0)))
    Streams.incrementalUpsert(spark, src2, fact, keys, ord)
    val treeAfter = KeyedFold.partFilesRec(fact)
    val evs = StateFold.events
      .filter(e => e.dir == fact && e.kind == "keyed-overwrite")
    assert(evs.size >= 2, s"expected 2+ keyed-overwrite events, got $evs")
    val last = evs.last
    // the single-key batch's touched partition
    val expectKh = Seq((7L, "click")).toDF("user_id", "event_type")
      .select(KeyedFold.kh(keys.map(
        org.apache.spark.sql.functions.col))).head.getInt(0)
    // the journal itself only ever LISTED the touched subdir — the
    // metadata cost of the fold is ∝ touched partitions too
    assert((last.before ++ last.after).forall(_.startsWith(s"kh=$expectKh/")),
      s"journal listing leaked outside the touched partition: $last")
    def byPart(fs: Set[String]): Map[String, Set[String]] =
      fs.groupBy(_.split("/")(0))
    val before = byPart(treeBefore); val after = byPart(treeAfter)
    // every partition other than the touched one is byte-file-identical
    (before.keySet ++ after.keySet).filterNot(_ == s"kh=$expectKh")
      .foreach { p =>
        assert(before.get(p) == after.get(p),
          s"partition $p was rewritten by a batch that never touched it")
      }
    // ... and the touched one WAS rewritten (fresh part files)
    assert(before.get(s"kh=$expectKh") != after.get(s"kh=$expectKh"),
      "the touched partition must carry new part files")
    // write volume ∝ touched keys: a 1-key batch rewrote 1 of the
    // populated partitions, not the state
    assert(before.size > 4, "fixture must populate several partitions")
    // cross-batch semantics survived the pruned read: the newer event
    // 100 replaces (7, click)'s batch-1 row, everyone else survives —
    // exactly what breaks if a batch ever sees an empty prior
    val got = spark.read.parquet(fact)
      .select("event_id").as[Long].collect().sorted.toSeq
    val expect = ((1L to 40L).filterNot(_ == 7L) :+ 100L).sorted
    assert(got == expect,
      s"keep-latest over both batches must win: $got")
    } finally {
      Seq(java.nio.file.Paths.get(src1), java.nio.file.Paths.get(src2),
        factRoot).foreach(graft.Publish.deleteTree)
    }
  }

  test("st36: a duplicate span split across batches cuts keep-first, exactly as batch x41") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import streaming.StateFold
    // doc 0 (batch 1) carries the phrase; doc 1 (batch 2) repeats it —
    // the decision must run on the CONVERGED index, so the later
    // occurrence is cut even though the batches never met
    val phrase = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val d0 = Seq("x0", "x1") ++ phrase ++ Seq("x2")
    val d1 = Seq("y0") ++ phrase ++ Seq("y1", "y2")
    val ix = java.nio.file.Files.createTempDirectory("r14span").toString
    def fold(doc: Long, ts: Seq[String]): Unit = StateFold.append(
      ts.zipWithIndex.map { case (w, i) => (doc, i, w) }
        .toDF("doc_id", "i", "word"), ix)
    fold(0L, d0) // batch 1
    fold(1L, d1) // batch 2
    val base = spark.read.parquet(ix).groupBy(col("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("word")))),
        x => x.getField("word")).as("ws"))
    val got = operators.Corpus.spanDedupFrom(base).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_kept"), r.getAs[String]("clean_text"))).toMap
    assert(got(0L) == (8, d0.mkString(" ")), s"first occurrence intact: $got")
    assert(got(1L) == (3, "y0 y1 y2"), s"later occurrence cut: $got")
    Publish.deleteTree(java.nio.file.Paths.get(ix))
  }

  test("x225/x226: exact-vs-gram contamination — stitching over-cuts, the exact arm does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // eval doc 0 = "a b c d e f g": each of its three 5-grams occurs in
    // a DIFFERENT train doc, but no train doc shares a >=7-token span.
    // The gram cutter stitches the three hits into a run of 3 and cuts
    // the whole doc (fp = 7); the exact arm cuts nothing.
    val docs = Seq(
      (0L, "a b c d e f g", false),
      (1L, "a b c d e x p q r s t u v", true),
      (2L, "w b c d e f y n o m l k j", true),
      (3L, "z c d e f g q h i u t s r", true))
    val tok = docs.flatMap { case (id, t, _) =>
      t.split(" ").zipWithIndex.map { case (w, i) => (id, i.toLong, w) }
    }.toDF("doc_id", "i", "word")
    val split = docs.map { case (id, _, tr) => (id, tr) }
      .toDF("doc_id", "is_train")
    val frontier = operators.Tokens.exactContamFrontier(
      operators.Tokens.islandMembers(
        operators.Tokens.suffixLcpFrom(tok), 7), split)
    assert(frontier.count() == 0L,
      "no >=7-token span is shared with any single train doc")
    // the gram arm over the same crafted corpus: build the contamGrams
    // frame directly (explicit split instead of the fingerprint rule)
    val cg = docs.toDF("doc_id", "text", "is_train")
      .select(col("doc_id"), col("is_train"),
        org.apache.spark.sql.functions.split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("is_train"),
        size(col("t")).cast("long").as("n_tokens"),
        explode(transform(sequence(lit(1), size(col("t")) - 4),
          i => struct(i.as("pos"), concat_ws(" ",
            (0 until 5).map(k => element_at(col("t"), i + k)): _*)
            .as("g")))).as("pg"))
      .select(col("doc_id"), col("is_train"), col("n_tokens"),
        col("pg.pos").as("pos"), col("pg.g").as("g"))
    val gspans = operators.Mining.contamRunSpans(cg).collect()
    assert(gspans.length == 1 &&
      gspans.head.getAs[Long]("s0") == 1L &&
      gspans.head.getAs[Long]("e0") == 8L,
      s"the stitched run must cut the whole eval doc: ${gspans.toSeq}")
  }

  test("x225/x226 reconcile: exact position mass equals x225's coverage sum, fn = 0") {
    // query-surface cross-check at sf0.001: the audit's exact_tokens
    // equals the per-doc exact coverage total, and the gram cutter's
    // recall is 1.0 (fn = 0 — the window lemma, MEASURED)
    val x225 = SparkEntry.queries("x225_exact_contamination")(spark, sf0_001)
      .collect()
    val x226 = SparkEntry.queries("x226_contamination_gap")(spark, sf0_001)
      .collect()
    val covSum = x225.map(_.getAs[Long]("contam_tokens")).sum
    val exactSum = x226.map(_.getAs[Long]("exact_tokens")).sum
    assert(covSum == exactSum && covSum > 0,
      s"exact mass must reconcile: coverage $covSum vs audit $exactSum")
    x226.foreach { r =>
      assert(r.getAs[Long]("fn") == 0L,
        s"gram recall must be 1.0 (window lemma): $r")
    }
  }

  test("x222 returns zero rows on a corpus with no repeated token") {
    import spark.implicits._
    // all tokens globally distinct -> max adjacent LCP is 0; the old
    // behavior emitted a phantom row (repeat_len 0, empty phrase)
    val tok = (0 until 12).map(i => (i.toLong / 4, (i % 4).toLong, s"u$i"))
      .toDF("doc_id", "i", "word")
    val lcp = operators.Tokens.suffixLcpFrom(tok)
    assert(lcp.agg(max(col("lcp"))).head.getLong(0) == 0L)
    // replicate x222's serve over the crafted lcp frame: the ml >= 1
    // guard must empty the argmax pipeline
    val mx = lcp.agg(max(col("lcp")).as("ml"))
    val er = lcp.crossJoin(broadcast(mx))
      .filter(col("lcp") === col("ml") && col("ml") >= 1)
    assert(er.count() == 0L)
  }
}
