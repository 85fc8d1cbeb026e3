package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 pins: the bounded co-activity arm (x182) must agree with the
  * exact quadratic arm (x107) on the pairs it exists to find, at a
  * candidate volume strictly below the exact pair volume (VERDICT r9
  * item 1); the audio fingerprint near-dup (m21) must lose no pair the
  * brute-force all-pairs scan finds (VERDICT r9 item 5); and x142's
  * DOUBLE arm must match its integer arm wherever the integer arm is
  * in-range (VERDICT r9 item 4).
  */
class Round10Spec extends AnyFunSuite {
  import SparkTestSession._

  test("x182: the KMV candidate set recovers x107's exact top-10 verbatim (estimate-then-verify calibration)") {
    // the sketch arm's report is exact Jaccard over its candidates, so
    // agreement with the exact arm's head IS the recall proof: every one
    // of the top-10 pairs survived the signature + crowded-bucket stages
    val exact = SparkEntry.queries("x107_coactivity_jaccard")(spark, sf0_001)
      .limit(10).collect().map(_.toSeq.toList).toList
    val sketch = SparkEntry.queries("x182_coactivity_kmv")(spark, sf0_001)
      .limit(10).collect().map(_.toSeq.toList).toList
    assert(exact.nonEmpty)
    assert(sketch == exact,
      "bounded arm's head must equal the exact arm's head row-for-row")
  }

  test("x182: candidate volume stays strictly below the exact pair volume") {
    val uh = operators.Analytics.coactivityHours(spark, sf0_001)
    val nCand = operators.Analytics.coactivityCandidates(uh).count()
    val nExact = uh.as("a")
      .join(uh.as("b"),
        col("a.hk") === col("b.hk") && col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id"), col("b.user_id")).distinct().count()
    assert(nCand > 0 && nCand < nExact,
      s"expected bounded candidates < exact pairs, got $nCand vs $nExact")
    // the formal linear bound the cap guarantees at ANY user count
    val nUsers = uh.select(col("user_id")).distinct().count()
    assert(nCand <= 16L * 512L * nUsers)
  }

  test("m21: the banded acoustic-fingerprint join loses no pair vs brute-force all-pairs at Hamming ≤ 2") {
    val fps = operators.Multimodal.audioFingerprints(spark, sf0_001)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(fps.length > 100, s"fixture must carry fingerprints, got ${fps.length}")
    val exact = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      h = Integer.bitCount(fa ^ fb) if h <= 2
    } yield (ida, idb, h)).toSet
    // pigeonhole: Hamming ≤ 2 over 4 bands ⇒ ≥ 2 untouched bands, so the
    // band-value equi-join candidates are a SUPERSET of the exact pairs
    val banded = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      if (0 until 4).exists(b => ((fa >> (4 * b)) & 15) == ((fb >> (4 * b)) & 15))
      h = Integer.bitCount(fa ^ fb) if h <= 2
    } yield (ida, idb, h)).toSet
    assert(banded == exact, "banding must lose no qualifying pair")
    val got = SparkEntry.queries("m21_audio_fingerprint_neardup")(spark, sf0_001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    val top = exact.toList.sortBy(t => (t._3, t._1, t._2)).take(20)
    assert(got == top, "query head must equal the brute-force head")
  }

  test("x183: packing plan conserves every doc and respects the token lower bound") {
    val plan = SparkEntry.queries("x183_sequence_packing")(spark, sf0_001)
      .collect()
    assert(plan.nonEmpty)
    val nDocs = Tables.documents(spark, sf0_001)
      .filter(size(filter(functions.Text.tokens(col("text")),
        w => length(w) > 0)) > 0)
      .count()
    val planDocs = plan.map(_.getAs[Long]("n_docs")).sum
    val planSeqs = plan.map(_.getAs[Long]("n_seqs")).sum
    val totalTokens = plan.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Long]("len")).sum
    // every nonzero-token doc lands in exactly one bucket
    assert(planDocs == nDocs, s"plan covers $planDocs of $nDocs docs")
    // no plan can beat the token mass: Σ n_seqs ≥ ⌈Σ len / 512⌉
    assert(planSeqs >= (totalTokens + 511) / 512)
    // fill never exceeds 100%
    assert(plan.forall(_.getAs[Long]("fill_ppm") <= 1000000L))
  }

  test("st27: the streaming packing state answers the batch x183 plan verbatim") {
    val batch = SparkEntry.queries("x183_sequence_packing")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    val streamed = SparkEntry.queries("st27_stream_packing")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    assert(streamed == batch, "stream==batch must hold row-for-row")
  }

  test("st28: the streaming golden-record state answers the batch x184 report verbatim") {
    val batch = SparkEntry.queries("x184_golden_record")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    val streamed = SparkEntry.queries("st28_stream_golden_record")(
      spark, sf0_001).collect().map(_.toSeq.toList).toList
    assert(batch.nonEmpty)
    assert(streamed == batch, "stream==batch must hold row-for-row")
  }

  test("x185: union blocking reaches full recall and every scheme strictly reduces the pair space") {
    val rep = SparkEntry.queries("x185_blocking_audit")(spark, sf0_001)
      .collect()
    assert(rep.map(_.getAs[String]("scheme")).sorted.toList ==
      List("adj", "noun", "union"))
    val by = rep.map(r => r.getAs[String]("scheme") -> r).toMap
    // union blocking must recover the full exact-JW match set — the
    // same guarantee x159's recall spec pins for the match query itself
    assert(by("union").getAs[Long]("completeness_ppm") == 1000000L)
    assert(by("union").getAs[Long]("n_found") ==
      by("union").getAs[Long]("n_truth"))
    rep.foreach { r =>
      assert(r.getAs[Long]("reduction_ppm") > 0,
        s"${r.getAs[String]("scheme")} must prune vs all-pairs")
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_candidates"))
    }
    // the union candidate set is at most the sum of its arms (dedup)
    assert(by("union").getAs[Long]("n_candidates") <=
      by("adj").getAs[Long]("n_candidates") +
      by("noun").getAs[Long]("n_candidates"))
  }

  test("x186: per-doc repetition stats match a plain Scala recount") {
    val got = SparkEntry.queries("x186_repetition_audit")(spark, sf0_001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf0_001)
      .select(col("doc_id"), col("text")).collect()
    var checked = 0
    docs.foreach { r =>
      val id = r.getLong(0)
      val t = r.getString(1).split(" ", -1) // -1: keep trailing empties, as Spark split does
      if (t.length >= 3) {
        val bgs = t.sliding(2).map(_.mkString(" ")).toList
        val tgs = t.sliding(3).map(_.mkString(" ")).toList
        val bc = bgs.groupBy(identity).view.mapValues(_.size).toList
        val (topG, topC) = bc.sortBy { case (g, c) => (-c, g) }.head
        val row = got(id)
        assert(row.getAs[String]("top_bigram") == topG, s"doc $id top bigram")
        assert(row.getAs[Long]("top_c") == topC.toLong)
        assert(row.getAs[Long]("top_bigram_ppm") ==
          topC.toLong * 1000000L / bgs.size)
        val dupTri = tgs.groupBy(identity).values.map(_.size)
          .filter(_ >= 2).sum
        assert(row.getAs[Long]("dup_trigram_ppm") ==
          dupTri.toLong * 1000000L / tgs.size, s"doc $id dup trigrams")
        checked += 1
      }
    }
    assert(checked == got.size, "every reported doc recounted")
  }

  test("x187: systematic PPS conserves k and respects the inclusion bound") {
    val k = 20L
    val rep = SparkEntry.queries("x187_pps_systematic")(spark, sf0_001)
      .collect()
    assert(rep.map(_.getAs[Long]("n_picks")).sum == k, "sum of picks = k")
    val tot = Tables.documents(spark, sf0_001).filter(col("n_chars") > 0)
      .agg(sum(col("n_chars"))).head.getLong(0)
    rep.foreach { r =>
      val w = r.getAs[Long]("w"); val p = r.getAs[Long]("n_picks")
      assert(p >= k * w / tot && p <= (k * w + tot - 1) / tot,
        s"doc ${r.getAs[Long]("doc_id")}: picks $p outside [⌊kw/tot⌋,⌈kw/tot⌉]")
    }
    // unsampled docs must also satisfy the bound: ⌊kw/tot⌋ = 0 for them
    val sampled = rep.map(_.getAs[Long]("doc_id")).toSet
    Tables.documents(spark, sf0_001).filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars")).collect().foreach { r =>
        if (!sampled(r.getLong(0)))
          assert(k * r.getLong(1) / tot == 0L,
            s"doc ${r.getLong(0)} deserved a pick but got none")
      }
  }

  test("x188: per-doc shared-trigram shares match a plain Scala recount") {
    val got = SparkEntry.queries("x188_novelty_audit")(spark, sf0_001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf0_001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .filter(_._2.length >= 3)
    val perDoc = docs.map { case (id, t) =>
      id -> t.sliding(3).map(_.mkString(" ")).toList
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val df = perDoc.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    assert(got.keySet == perDoc.keySet)
    perDoc.foreach { case (id, grams) =>
      val n = grams.values.sum
      val shared = grams.collect {
        case (g, c) if df(g) >= 2 => c
      }.sum
      val row = got(id)
      assert(row.getAs[Long]("n_trigrams") == n, s"doc $id n_trigrams")
      assert(row.getAs[Long]("n_shared") == shared, s"doc $id n_shared")
      assert(row.getAs[Long]("shared_ppm") == shared * 1000000L / n)
    }
  }

  test("x189: every estimator arm matches a plain Scala recount of the key synopses") {
    val row = SparkEntry.queries("x189_join_cardinality")(spark, sf0_001)
      .collect().head
    val ev = Tables.events(spark, sf0_001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def counts(t: String) = ev.filter(_._2 == t).groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    val a = counts("click"); val b = counts("view")
    val exact = a.keySet.intersect(b.keySet).toList.map(u => a(u) * b(u)).sum
    assert(row.getAs[Long]("exact_pairs") == exact)
    assert(row.getAs[Long]("n_a") == a.values.sum)
    assert(row.getAs[Long]("d_b") == b.size.toLong)
    assert(row.getAs[Long]("sj_a") == a.values.map(c => c * c).sum)
    val sysr = a.values.sum * b.values.sum / math.max(a.size, b.size)
    assert(row.getAs[Long]("sysr_est") == sysr)
    val cs = 4L * a.keySet.intersect(b.keySet).toList
      .filter(u => ((u * 2654435761L + 12345L) % 1000000007L) % 4 == 0)
      .map(u => a(u) * b(u)).sum
    assert(row.getAs[Long]("cs_est") == cs)
    assert(row.getAs[Long]("cs_err_ppm") ==
      math.abs(cs - exact) * 1000000L / exact)
  }

  test("x190: band totals conserve the posting mass and reprice a Scala recount") {
    val bands = SparkEntry.queries("x190_posting_plan")(spark, sf0_001)
      .collect()
    val postings = Tables.documents(spark, sf0_001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).distinct
        .map(t => (t, r.getLong(0))))
    val u = postings.map(_._2).max + 1
    def bits(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val perTerm = postings.groupBy(_._1).map { case (t, ps) =>
      val ids = ps.map(_._2).sorted
      val gaps = (ids.head + 1) +: ids.sliding(2).collect {
        case Array(x, y) => y - x }.toSeq
      val varint = gaps.map(g => 8L * ((bits(g) + 6) / 7)).sum
      val df = ids.length.toLong
      val ef = df * (2L + math.max(0, bits(u / df) - 1))
      (t, df, varint, ef)
    }
    assert(bands.map(_.getAs[Long]("n_postings")).sum ==
      postings.length.toLong, "posting mass conserved")
    assert(bands.map(_.getAs[Long]("n_terms")).sum == perTerm.size.toLong)
    val byBand = perTerm.groupBy { case (_, df, _, _) => bits(df).toLong }
    bands.foreach { r =>
      val g = byBand(r.getAs[Long]("df_band"))
      assert(r.getAs[Long]("varint_bits") == g.map(_._3).sum, "varint bits")
      assert(r.getAs[Long]("ef_bits") == g.map(_._4).sum, "EF bits")
      assert(r.getAs[Long]("bitmap_bits") == g.size.toLong * u)
    }
  }

  test("x191: SCD2 intervals tile each user's event history exactly") {
    val rows = SparkEntry.queries("x191_scd2_history")(spark, sf0_001)
      .collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val evCount = Tables.events(spark, sf0_001).groupBy(col("user_id"))
      .agg(count(lit(1))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser.keySet == evCount.keySet)
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("run_id"))
      // runs are 1..n with exactly one open (current) run, the last
      assert(sorted.map(_.getAs[Long]("run_id")).toSeq ==
        (1L to sorted.length).toSeq)
      assert(sorted.count(_.getAs[Long]("is_current") == 1L) == 1)
      assert(sorted.last.getAs[Long]("is_current") == 1L)
      assert(sorted.last.get(sorted.last.fieldIndex("valid_to")) == null)
      // intervals tile: run k's valid_to == run k+1's valid_from
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[AnyRef]("valid_to") == y.getAs[AnyRef]("valid_from"),
            s"user $u: intervals must tile")
          assert(x.getAs[String]("status") != y.getAs[String]("status"),
            s"user $u: adjacent runs must change status")
        case _ =>
      }
      // every event is in exactly one run
      assert(sorted.map(_.getAs[Long]("n_events")).sum == evCount(u))
    }
  }

  test("x184: CC over the fuzzy-match graph reaches fixpoint by round 4 and partitions the matched names") {
    val e0 = operators.Dedup.fuzzyNamePairs(spark, sf0_001)
    val e = e0.select(col("name_a").as("src"), col("name_b").as("dst"))
      .union(e0.select(col("name_b").as("src"), col("name_a").as("dst")))
      .distinct().localCheckpoint()
    val l4 = operators.Corpus.ccLabels(e, rounds = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val l5 = operators.Corpus.ccLabels(e, rounds = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(l4 == l5, "round 4 must already be the fixpoint")
    // partition: every matched name has exactly one label, and each
    // cluster's canonical is its least member (min-label semantics)
    val matched = e.select(col("src")).distinct().collect()
      .map(_.getString(0)).toSet
    assert(l4.keySet == matched)
    l4.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min == comp, s"canonical of $comp must be least")
    }
    // and the report's variant counts sum to the multi-variant mass
    val rep = SparkEntry.queries("x184_golden_record")(spark, sf0_001).collect()
    assert(rep.nonEmpty)
    val multi = l4.groupBy(_._2).filter(_._2.size >= 2)
    assert(rep.map(_.getAs[Long]("n_variants")).sum == multi.values.map(_.size).sum)
    assert(rep.map(_.getAs[String]("canonical_name")).toSet == multi.keySet)
  }
}
