package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pins. First in: the x193 strict-ordering funnel gets the
  * house brute-force pin it missed when it landed in round 10's
  * end-of-round snapshot (VERDICT r10 item 3) — the three-stage
  * earliest-qualifying-anchor funnel recomputed from collected events,
  * plus the degenerate empty-stage designed-NULL path on a clickless
  * fixture.
  */
class Round11Spec extends AnyFunSuite {
  import SparkTestSession._

  private val H24 = 24L * 3600L * 1000000L // micros

  test("x193: funnel counts and ppm conversions match a brute-force earliest-anchor recomputation") {
    val evs = Tables.events(spark, sf0_001)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    // step 1: first click; steps 2/3: first qualifying event strictly
    // after the previous anchor and within 24h of it
    val s1: Map[Long, Long] = byUser.flatMap { case (u, es) =>
      val c = es.filter(_._2 == "click").map(_._3)
      if (c.isEmpty) None else Some(u -> c.min)
    }
    def step(prev: Map[Long, Long], et: String): Map[Long, Long] =
      prev.flatMap { case (u, t) =>
        val c = byUser.getOrElse(u, Array.empty[(Long, String, Long)])
          .filter(e => e._2 == et && e._3 > t && e._3 <= t + H24).map(_._3)
        if (c.isEmpty) None else Some(u -> c.min)
      }
    val s2 = step(s1, "view")
    val s3 = step(s2, "purchase")
    val n0 = byUser.size.toLong
    val Seq(n1, n2, n3) = Seq(s1, s2, s3).map(_.size.toLong)
    assert(n0 > 0 && n1 > 0 && n2 > 0 && n3 > 0,
      s"every stage must fire at sf0.001 for the pin to bite: $n0/$n1/$n2/$n3")
    def ppm(n: Long, d: Long): Any =
      if (d == 0) null else Math.floorDiv(n * 1000000L, d)
    val expected = List(
      List(1, "click", n1, ppm(n1, n0)),
      List(2, "view", n2, ppm(n2, n1)),
      List(3, "purchase", n3, ppm(n3, n2)))
    val got = SparkEntry.queries("x193_strict_funnel")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    assert(got == expected)
  }

  test("x194: the emitted packing manifest conserves docs, never overflows a bin, packs contiguously, and agrees with x183's plan") {
    val rows = SparkEntry.queries("x194_packing_emission")(spark, sf0_001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conservation: every eligible doc (nonzero token count) assigned
    // exactly once, with its truncated length
    val lens = Tables.documents(spark, sf0_001)
      .select(col("doc_id"), least(size(filter(
        graft.functions.Text.tokens(col("text")),
        w => length(w) > 0)), lit(512)).cast("long").as("l"))
      .filter(col("l") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == lens.keySet)
    assert(rows.length == lens.size, "one manifest row per eligible doc")
    rows.foreach { case (id, len, _, _) => assert(len == lens(id)) }
    // per bin: homogeneous length, ≤ 512 tokens, offsets are the
    // contiguous arithmetic sequence 0, len, 2·len, …
    rows.groupBy(_._3).foreach { case (bin, ds) =>
      val ls = ds.map(_._2).distinct
      assert(ls.length == 1, s"bin $bin mixes lengths ${ls.toSeq}")
      assert(ds.map(_._2).sum <= 512L, s"bin $bin overflows the budget")
      assert(ds.map(_._4).sorted.toSeq ==
        ds.indices.map(i => i.toLong * ls.head),
        s"bin $bin offsets not contiguous")
    }
    // agreement with the x183 plan: per length bucket, the manifest uses
    // exactly n_seqs distinct bins, and bin ids are globally dense
    val plan = SparkEntry.queries("x183_sequence_packing")(spark, sf0_001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val binsPerLen = rows.groupBy(_._2).map { case (l, ds) =>
      l -> ds.map(_._3).distinct.length.toLong
    }
    assert(binsPerLen == plan)
    val allBins = rows.map(_._3).distinct.sorted
    assert(allBins.toSeq == (0L until plan.values.sum).toSeq,
      "bin ids must be dense 0..Σ n_seqs-1")
  }

  test("x195: the carry-forward as-of join equals a brute-force interval lookup against the SCD2 dimension") {
    // brute force: rebuild the non-purchase runs per user from collected
    // events, then for each purchase find the run with the greatest
    // valid_from <= ts (later run wins at exact ties)
    val evs = Tables.events(spark, sf0_001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val runsByUser = evs.filter(_._3 != "purchase").groupBy(_._2).map {
      case (u, es) =>
        val sorted = es.sortBy(e => (e._4, e._1)) // (ts, event_id)
        val runs = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, Long)] // (run_id, status, valid_from)
        sorted.foreach { e =>
          if (runs.isEmpty || runs.last._2 != e._3)
            runs += ((runs.length + 1L, e._3, e._4))
        }
        u -> runs.toList
    }
    val expected = evs.filter(_._3 == "purchase").map { p =>
      val valid = runsByUser.getOrElse(p._2, Nil)
        .filter(_._3 <= p._4)
      val run = if (valid.isEmpty) None else Some(valid.maxBy(_._1))
      List[Any](p._1, p._2,
        run.map(r => r._1: java.lang.Long).orNull, run.map(_._2).orNull)
    }.sortBy(_.head.asInstanceOf[Long]).toList
    val got = SparkEntry.queries("x195_scd2_pointintime")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_(3) != null),
      "fixture must enrich at least one purchase")
  }

  test("m22: cross-modal banding equals brute force over every under-cap pair (pigeonhole at dist <= 3)") {
    import org.apache.spark.sql.functions.{filter => afilter}
    def fpOf(bits: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      bits.groupBy(col("doc_id"))
        .agg(sum(expr("shiftleft(CAST(b AS BIGINT), i)")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tfp = fpOf(operators.Dedup.psimhashBits(spark, sf0_001))
    val ctok = Tables.documents(spark, sf0_001)
      .filter(length(encode(col("text"), "UTF-8")) >= 24)
      .select(col("doc_id"),
        explode(array_distinct(slice(afilter(
          graft.functions.Text.tokens(col("text")),
          w => length(w) > 0), 1, 8))).as("tok"))
    val cfp = fpOf(operators.Dedup.simhashBitsOf(ctok))
    // per-side band-bucket histograms — a pair is CAPTURE-GUARANTEED iff
    // some equal band has both sides' buckets under the 100 cap; with
    // dist <= 3 over 4 bands at least one band IS equal (pigeonhole),
    // but that band may be crowded — the operator's contract is exactly
    // the under-cap set
    def hist(fps: Map[Long, Long]): Map[(Int, Long), Int] =
      fps.values.toSeq
        .flatMap(fp => (0 until 4).map(b => (b, (fp >> (8 * b)) & 255L)))
        .groupBy(identity).map { case (k, v) => k -> v.size }
    val th = hist(tfp); val ch = hist(cfp)
    val expected = (for {
      (ta, fa) <- tfp.toSeq; (cb, fb) <- cfp.toSeq if ta != cb
      dist = java.lang.Long.bitCount(fa ^ fb) if dist <= 3
      if (0 until 4).exists { b =>
        val (ka, kb) = ((fa >> (8 * b)) & 255L, (fb >> (8 * b)) & 255L)
        ka == kb && th((b, ka)) <= 100 && ch((b, kb)) <= 100
      }
    } yield (dist, ta, cb)).sorted.take(100)
      .map { case (dist, a, b) => List[Any](a, b, dist) }.toList
    val got = SparkEntry.queries("m22_crossmodal_neardup")(spark, sf0_001)
      .collect().map(r =>
        List[Any](r.getLong(0), r.getLong(1), r.getInt(2))).toList
    assert(got == expected)
    assert(got.nonEmpty, "fixture must surface cross-modal pairs")
  }

  test("x196: relational BPE equals the sequential reference trainer for every budget round") {
    import org.apache.spark.sql.functions.{filter => afilter}
    // the classic sequential algorithm: count adjacent pairs weighted
    // by word frequency, pick (count DESC, pair ASC), apply the merge
    // with a left-to-right greedy scan
    var words: Map[Vector[String], Long] = Tables.documents(spark, sf0_001)
      .select(explode(afilter(graft.functions.Text.tokens(col("text")),
        t => length(t) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getString(0).toVector.map(_.toString) -> r.getLong(1))
      .toMap
    val expected = (1 to operators.Mining.BpeBudget).map { k =>
      val counts = words.toSeq
        .flatMap { case (syms, c) =>
          syms.sliding(2).collect { case Vector(a, b) => ((a, b), c) }
        }
        .groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
      val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      words = words.toSeq.map { case (syms, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), c)
      }.groupBy(_._1).map { case (s, v) => s -> v.map(_._2).sum }
      val symsAfter = words.map { case (s, c) => s.length * c }.sum
      List[Any](k, l, r, cnt, symsAfter)
    }.toList
    val got = SparkEntry.queries("x196_bpe_merges")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    assert(got == expected)
  }

  test("st29: streamed SCD2 equals the batch x191 dimension row-for-row, with real boundary merges") {
    val batch = SparkEntry.queries("x191_scd2_history")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    val stream = SparkEntry.queries("st29_stream_scd2")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    assert(batch.nonEmpty)
    assert(stream == batch, "stream state must answer the batch oracle verbatim")
    // the pin must actually exercise the frontier-extension path: if no
    // user's run straddled a slice boundary, per-slice run counts would
    // sum to the total and the merge arm never ran
    val stage = streaming.Streams.stageEventsTimeSplit(spark, sf0_001)
    val perSlice = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => operators.Merge.scd2RawRuns(
        Tables.normalizeTs(spark.read.parquet(f.toString))).count())
    assert(perSlice.sum > batch.size,
      s"no cross-slice run merge happened (${perSlice.toSeq} vs ${batch.size}) — " +
        "the extension arm is untested at this SF")
  }

  test("x197: the encoder applies exactly the merges x196 trained — corpus token totals reconcile") {
    val rows = SparkEntry.queries("x197_bpe_fertility")(spark, sf0_001)
      .collect()
    assert(rows.length > 1, "fixture must carry multiple sources")
    // Σ over sources of n_tokens == x196's final-round syms_after: the
    // fertility audit encodes with the SAME final symbol table whose
    // total the trainer reported (both are Σ_word wc·|symbols(word)|)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val symsAfter3 = SparkEntry.queries("x196_bpe_merges")(spark, sf0_001)
      .filter(col("round") === operators.Mining.BpeBudget)
      .collect()(0).getAs[Long]("syms_after")
    assert(totalTokens == symsAfter3,
      s"encoder/trainer drift: $totalTokens vs $symsAfter3")
    rows.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"))
      assert(t >= w && t <= c, s"tokens must sit between words and chars: $r")
      assert(r.getAs[Long]("fertility_ppm") == t * 1000000L / w)
      assert(r.getAs[Long]("compression_ppm") == t * 1000000L / c)
    }
  }

  test("st30: streamed word-count state retrains to the batch x196 merge table row-for-row") {
    val batch = SparkEntry.queries("x196_bpe_merges")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    val stream = SparkEntry.queries("st30_stream_bpe")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    assert(batch.length == operators.Mining.BpeBudget)
    assert(stream == batch,
      "folded counts must train the identical merge sequence")
  }

  test("x198: personalized PageRank equals a driver-side fold with the same rounding schedule, and trust actually discriminates") {
    def r6(x: Double): Double =
      BigDecimal(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val edges = Tables.documents(spark, sf0_001)
      .filter(col("doc_id") < 400 && (col("doc_id") * 48271) % 100 < 18)
      .select((col("doc_id") % 20).cast("int").as("s"),
        (expr("doc_id div 20") % 20).cast("int").as("t"))
      .filter(col("s") =!= col("t")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val outDeg = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val nN = nodes.length
    def step(p: Map[Int, Double], restart: Int => Double): Map[Int, Double] = {
      val m = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r6(p(src) / outDeg(src)) }.sum
      }
      nodes.map(v => v ->
        r6(0.15 * restart(v) + 0.85 * m.getOrElse(v, 0.0))).toMap
    }
    val seedV = (v: Int) => if (v % 7 == 0) r6(1.0 / 3) else 0.0
    val globV = (_: Int) => 1.0 / nN
    var t = nodes.map(v => v -> seedV(v)).toMap
    var g = nodes.map(v => v -> r6(1.0 / nN)).toMap
    (1 to 3).foreach { _ => t = step(t, seedV); g = step(g, globV) }
    val rows = SparkEntry.queries("x198_personalized_pagerank")(
      spark, sf0_001).collect()
    assert(rows.length == nN)
    val trustRankOrder = nodes.sortBy(v => (-t(v), v)).zipWithIndex
      .map { case (v, i) => v -> (i + 1) }.toMap
    rows.foreach { r =>
      val v = r.getAs[Int]("domain_id")
      assert(r.getAs[Int]("is_seed") == (if (v % 7 == 0) 1 else 0))
      assert(r.getAs[Double]("trust") == t(v), s"trust($v)")
      assert(r.getAs[Double]("authority") == g(v), s"authority($v)")
      assert(r.getAs[Long]("trust_lift_milli") ==
        math.round(1e-9 + t(v) * 1000 / g(v)), s"lift($v)")
      assert(r.getAs[Int]("trust_rank") == trustRankOrder(v), s"rank($v)")
    }
    // the personalization must DISCRIMINATE: trust reached some non-seed
    // (propagation is live) and the lift spread is real (not a rescaled
    // copy of global authority)
    assert(nodes.exists(v => v % 7 != 0 && t(v) > 0))
    val lifts = rows.map(_.getAs[Long]("trust_lift_milli")).distinct
    assert(lifts.length > 3, s"degenerate lift spread: ${lifts.toSeq}")
  }

  test("x193: an empty first stage reports the designed NULL downstream, not a div-by-zero accident") {
    val dir = java.nio.file.Files.createTempDirectory("x193deg").toString
    Tables.events(spark, sf0_001)
      .filter(col("event_type") =!= "click")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("x193_strict_funnel")(spark, dir)
      .collect().map(_.toSeq.toList).toList
    assert(rows == List(
      List(1, "click", 0L, 0L),       // 0 clickers out of n0 users: 0 ppm
      List(2, "view", 0L, null),      // n1 = 0 ⇒ designed NULL
      List(3, "purchase", 0L, null))) // n2 = 0 ⇒ designed NULL
  }
}
