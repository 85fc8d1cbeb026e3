package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}
import graft.functions.Text

/** Text-analysis suite for the training-data pipeline: language ID, quality
  * scoring, token counting, document fingerprinting, distinct counting —
  * every scalar path built from native functions (no UDFs), every query
  * oracle-checked.
  *
  * Scale design: the language profiles are a tiny (vocab × langs) table
  * derived once and broadcast for scoring; per-document metrics are
  * embarrassingly parallel column expressions; the rolling-hash fingerprint
  * folds tokens in a pinned order so results are reproducible anywhere.
  */
object TextAnalysis {

  /** The pinned rolling-hash fold in DuckDB SQL — interpolated into every
    * oracle that buckets by fingerprint (here and in [[Corpus]], ADVICE
    * r05: one definition, so shard assignment can't silently drift from
    * [[graft.functions.Text.fingerprint]]). */
  private[operators] val fingerprintSql =
    """list_reduce(
      |    list_prepend(CAST(7 AS BIGINT),
      |      list_transform(list_filter(string_split(text, ' '), w -> len(w) > 0),
      |        w -> CAST(list_sum(list_transform(range(len(w)),
      |               i -> unicode(w[i+1]) * (i + 1))) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin

  /** x97's relational answer — shared VERBATIM with st14's streaming
    * sample maintenance (top-k by a total priority order is a mergeable
    * fold: top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B)) for disjoint
    * batches), the st13↔q78 rule applied to weighted sampling. */
  private[graft] lazy val x97OracleSql: String =
    s"""WITH f AS (
      |  SELECT doc_id, source, n_chars, $fingerprintSql AS fp
      |  FROM documents
      |)
      |SELECT doc_id, source, n_chars,
      |       round(1e-9 + n_chars * 1000000008.0 / (fp + 1), 4) AS pri
      |FROM f ORDER BY pri DESC, doc_id LIMIT 20""".stripMargin

  /** (doc_id, fp) persisted content-keyed ([[DerivedTable]]): the rolling
    * hash is two nested interpreted higher-order aggregates — by far the
    * heaviest scalar in the library — and SEVEN queries bucket on it
    * (x10/x17/x18/x19/x22/x35/x36). A production pipeline computes the
    * content fingerprint once at ingest; recomputing it per query was
    * paying that cost seven times per pass over the corpus. */
  private[operators] def fingerprintTable(s: SparkSession, d: String): DataFrame =
    DerivedTable(s, d, "documents", "fptable") {
      Tables.documents(s, d)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
    }

  /** ln(256/V) for V in 1..255, computed ONCE here and used by BOTH
    * engines (interpolated into the x62 oracle as literals, loaded as a
    * broadcast table on the Spark side) — runtime libm never runs, so
    * the LinearCounting branch is bit-identical cross-engine. */
  private[operators] lazy val hllLnTable: Seq[(Int, Double)] =
    (1 until 256).map(v => v -> math.log(256.0 / v))

  private[operators] def hllLnValuesSql: String =
    hllLnTable.map { case (v, l) => s"($v, $l)" }.mkString(", ")

  /** The x62 portable-HLL mixer → per-row (reg, rho). Shared with st12's
    * streaming register fold (the st10↔x39 single-definition rule: batch
    * and streaming sketches must be the SAME function of the data, so the
    * pipeline lives in exactly one place). Input: a `user_id` column. */
  private[graft] def hllRegRho(ev: DataFrame): DataFrame =
    ev.select(expr("user_id & 4294967295").as("a"))
      .select(expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295").as("a"))
      .select(expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295").as("a"))
      .select(expr("shiftright(a, 16) ^ a").as("h"))
      .select((col("h") % 256).cast("int").as("reg"),
        when(expr("h div 256") === 0, 25)
          .otherwise(lit(25) - length(bin(expr("h div 256"))))
          .cast("int").as("rho"))

  /** (reg, rho) rows (raw per-row OR an already-folded register state —
    * the max-merge makes both equivalent) + the exact arm → x62's
    * 6-column estimate report. Estimate math runs on 256 rows. */
  private[graft] def hllEstimate(s: SparkSession, rr: DataFrame,
      ex: DataFrame): DataFrame = {
    import s.implicits._
    val regs = s.range(256).select(col("id").cast("int").as("reg"))
      .join(rr.groupBy(col("reg")).agg(max(col("rho")).as("mr")),
        Seq("reg"), "left")
      .select(coalesce(col("mr"), lit(0)).cast("int").as("m"))
    val agg = regs.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 25 - m)")).as("intsum"),
      sum(col("m")).cast("long").as("sum_m"),
      sum(when(col("m") === 0, 1L).otherwise(0L)).as("n_zero"))
    val lnDf = hllLnTable.toDF("zv", "lnv")
    val raw = lit(0.7183) * 65536 * 33554432 / col("intsum")
    val isLc = raw <= 640 && col("n_zero") > 0
    val est = when(isLc, lit(256.0) * col("lnv")).otherwise(raw)
    ex.crossJoin(agg.join(broadcast(lnDf),
        col("n_zero") === col("zv"), "left"))
      .select(col("n_exact"), col("sum_m"), col("n_zero"),
        when(isLc, "lc").otherwise("raw").as("regime"),
        Num.roundOut(est, 4).as("hll_est"),
        Num.roundOut(abs(est - col("n_exact")) / col("n_exact"), 4)
          .as("rel_err"))
  }

  /** x62's oracle, shared VERBATIM with st12's streaming fold: the
    * converged streaming register state must equal the batch sketch, so
    * both queries answer to the same SQL. */
  private[graft] def x62OracleSql: String =
    s"""WITH h0 AS (
      |  SELECT user_id & 4294967295 AS a FROM events
      |), h1 AS (
      |  SELECT (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h0
      |), h2 AS (
      |  SELECT (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h1
      |), hv AS (
      |  SELECT xor(a >> 16, a) AS h FROM h2
      |), rr AS (
      |  SELECT CAST(h % 256 AS INT) AS reg,
      |         CASE WHEN h // 256 = 0 THEN 25
      |              ELSE CAST(25 - len(bin(h // 256)) AS INT) END AS rho
      |  FROM hv
      |), regs AS (
      |  SELECT spine.reg, CAST(coalesce(max(rr.rho), 0) AS INT) AS m
      |  FROM (SELECT CAST(unnest(range(256)) AS INT) AS reg) spine
      |  LEFT JOIN rr ON rr.reg = spine.reg
      |  GROUP BY spine.reg
      |), agg AS (
      |  SELECT CAST(sum(1::BIGINT << (25 - m)) AS BIGINT) AS intsum,
      |         CAST(sum(m) AS BIGINT) AS sum_m,
      |         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      |  FROM regs
      |), lnt(zv, lnv) AS (
      |  VALUES $hllLnValuesSql
      |), fin AS (
      |  SELECT agg.sum_m, agg.n_zero,
      |         0.7183 * 65536 * 33554432 / agg.intsum AS raw, lnt.lnv
      |  FROM agg LEFT JOIN lnt ON lnt.zv = agg.n_zero
      |), ex AS (
      |  SELECT count(DISTINCT user_id) AS n_exact FROM events
      |)
      |SELECT ex.n_exact, fin.sum_m, fin.n_zero,
      |       CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
      |            THEN 'lc' ELSE 'raw' END AS regime,
      |       round(1e-9 + CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
      |             THEN 256 * fin.lnv ELSE fin.raw END, 4) AS hll_est,
      |       round(1e-9 + abs(CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
      |             THEN 256 * fin.lnv ELSE fin.raw END - ex.n_exact)
      |             / ex.n_exact, 4) AS rel_err
      |FROM fin, ex""".stripMargin

  /** x08's per-doc token-stat CTE in DuckDB SQL, shared with x59's
    * canonical selection (one definition — the fingerprintSql rule).
    * Defs, not vals: `entries` initializes first. */
  /** x93's hashed-linear score components (doc_id, n_tokens, score_sum)
    * — the hashing-trick scorer factored out so x117's calibration table
    * reads the same score definition verbatim. */
  private[graft] def hashedScoreTable(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val t2 = Tokens.table(s, d).filter(length(col("word")) > 0)
      .select(col("doc_id"), col("word"))
    val voc = t2.select(col("word")).distinct()
      .withColumn("f", Text.charHash(col("word")) % 512)
    val wt = voc
      .withColumn("a", expr("f * 2654435761 & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .select(col("word"),
        (expr("shiftright(a, 16) ^ a") % 2001L - 1000L).as("w"))
    t2.join(broadcast(wt), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_sum"))
  }

  /** x93's score pipeline as shared DuckDB CTEs (t2 → voc → h → w0 → w1 →
    * wt → sc), interpolated into both the x93 and x117 oracles. */
  private[operators] def hashedScoreCteSql: String =
    """t2 AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |                 w -> len(w) > 0)) AS word
      |  FROM documents
      |), voc AS (
      |  SELECT DISTINCT word FROM t2
      |), h AS (
      |  SELECT word, list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(range(len(word)),
      |             i -> CAST(unicode(word[i+1]) AS BIGINT))),
      |           (acc, c) -> (acc * 31 + c) % 1000000007) % 512 AS f
      |  FROM voc
      |), w0 AS (
      |  SELECT word, (f * 2654435761) & 4294967295 AS a FROM h
      |), w1 AS (
      |  SELECT word, (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM w0
      |), wt AS (
      |  SELECT word, CAST(xor(a >> 16, a) % 2001 - 1000 AS BIGINT) AS w
      |  FROM w1
      |), sc AS (
      |  SELECT t2.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |         CAST(sum(wt.w) AS BIGINT) AS score_sum
      |  FROM t2 JOIN wt USING (word) GROUP BY 1
      |)""".stripMargin

  private[operators] def qualityMSql: String =
    """m AS (
      |  SELECT doc_id, n_chars,
      |         CAST(len(ws) AS INT) AS n_tokens,
      |         len(list_distinct(ws)) AS n_distinct,
      |         len(list_filter(ws, x -> x IN ('a', 'the'))) AS n_stop,
      |         list_sum(list_transform(ws, x -> len(x))) AS sum_len
      |  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
      |        FROM documents)
      |)""".stripMargin

  /** The composite quality score over m's fields (0.5·TTR + 0.3·(1−stop)
    * + 0.2·capped-avg-token-len), rounded 4 — the rounding is what makes
    * cross-engine ORDERING by quality deterministic (x59 ranks on it). */
  private[operators] def qualitySql: String =
    """round(1e-9 + 0.5 * (n_distinct * 1.0 / n_tokens)
      |             + 0.3 * (1 - n_stop * 1.0 / n_tokens)
      |             + 0.2 * least(sum_len * 1.0 / n_tokens / 8.0, 1.0),
      |             4)""".stripMargin

  /** x174's full oracle — shared VERBATIM with st25's streaming
    * calibration maintenance (the q78↔st13 / x156↔st24 contract applied
    * to the reliability table): one answer definition for both paths. */
  private[graft] def x174OracleSql: String =
    s"""WITH $hashedScoreCteSql, $qualityMSql, lab AS (
      |  SELECT doc_id, $qualitySql AS quality
      |  FROM m WHERE n_tokens > 0
      |), j AS (
      |  SELECT sc.doc_id,
      |         CAST(floor((sc.score_sum * 1.0 / sc.n_tokens) / 100)
      |              AS BIGINT) AS bin,
      |         CASE WHEN lab.quality >= 0.63 THEN 1 ELSE 0 END AS pos
      |  FROM sc JOIN lab USING (doc_id)
      |), b AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(pos) AS BIGINT) AS p
      |  FROM j GROUP BY bin
      |), iv AS (
      |  SELECT lo.bin AS lo, hi.bin AS hi,
      |         sum(m2.p) * 1.0 / sum(m2.n) AS mu
      |  FROM b lo JOIN b hi ON lo.bin <= hi.bin
      |  JOIN b m2 ON m2.bin BETWEEN lo.bin AND hi.bin
      |  GROUP BY 1, 2
      |), lower_env AS (
      |  SELECT i.bin, iv.lo, min(iv.mu) AS mn
      |  FROM b i JOIN iv ON iv.lo <= i.bin AND iv.hi >= i.bin
      |  GROUP BY 1, 2
      |), fit AS (
      |  SELECT bin, max(mn) AS iso FROM lower_env GROUP BY 1
      |)
      |SELECT b.bin, CAST(b.bin * 100 AS BIGINT) AS bin_lo, b.n AS n_docs,
      |       b.p AS n_pos,
      |       round(1e-9 + b.p * 1.0 / b.n, 4) AS pos_rate,
      |       round(1e-9 + fit.iso, 4) AS iso_rate
      |FROM b JOIN fit USING (bin) ORDER BY b.bin""".stripMargin

  /** The (bin, n, p) reliability table → full x174 isotonic report —
    * shared by the batch entry and st25's converged-stream readout. The
    * input is bins-bounded; everything here is bins³ relational algebra
    * (see x174's header comment). */
  private[graft] def pavReport(
      bins: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val b = bins.localCheckpoint() // bins-bounded; feeds four self-join roles
    // every non-equi self-join side is EXPLICITLY broadcast: the bin grid
    // is ≤ ~40 rows by construction, but Spark's size estimate for a
    // checkpointed lineage varies with the producing plan — x206 (bins
    // derived through the qweights artifact scan) planned these as
    // CartesianProduct where x174's identical code got BNLJ; the hint
    // makes the nested-loop-over-broadcast shape deterministic for every
    // caller instead of a stats accident
    val iv = b.select(col("bin").as("lo"))
      .join(broadcast(b.select(col("bin").as("hi"))), col("lo") <= col("hi"))
      .join(broadcast(b.select(col("bin").as("mb"), col("n"), col("p"))),
        col("mb").between(col("lo"), col("hi")))
      .groupBy(col("lo"), col("hi"))
      .agg((sum(col("p")) * 1.0 / sum(col("n"))).as("mu"))
    val lowerEnv = b.select(col("bin"))
      .join(broadcast(iv), col("lo") <= col("bin") && col("hi") >= col("bin"))
      .groupBy(col("bin"), col("lo"))
      .agg(min(col("mu")).as("mn"))
    val fit = lowerEnv.groupBy(col("bin")).agg(max(col("mn")).as("iso"))
    b.join(fit, "bin")
      .select(col("bin"), (col("bin") * 100).as("bin_lo"),
        col("n").as("n_docs"), col("p").as("n_pos"),
        Num.roundOut(col("p") * 1.0 / col("n"), 4).as("pos_rate"),
        Num.roundOut(col("iso"), 4).as("iso_rate"))
      .orderBy(col("bin"))
  }

  /** One micro-batch of documents → its ADDITIVE (bin, n, p) reliability
    * delta — the x93 hashing-trick score and x08 quality label computed
    * INLINE on the batch (the weight is a pure function of the word, so
    * no persisted vocabulary is needed), binned exactly like
    * [[hashedScoreTable]]+x117. Each document contributes to exactly one
    * batch, so summing deltas over batches reproduces the full-corpus
    * bin table bit-for-bit — the additive state st25 maintains. */
  private[graft] def calibrationBinDelta(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sc = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("f", Text.charHash(col("word")) % 512)
      .withColumn("a", expr("f * 2654435761 & 4294967295"))
      .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
      .withColumn("w", expr("shiftright(a, 16) ^ a") % 2001L - 1000L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_sum"))
    val lab = docs
      .filter(size(Text.tokens(col("text"))) > 0)
      .select(col("doc_id"), qualityCol.as("quality"))
    sc.join(lab, "doc_id")
      .select(
        floor((col("score_sum") * 1.0 / col("n_tokens")) / 100)
          .cast("long").as("bin"),
        when(col("quality") >= 0.63, 1L).otherwise(0L).as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
  }

  /** The same composite quality as a Spark column over `text`. */
  private[graft] def qualityCol: org.apache.spark.sql.Column = {
    val ws = Text.tokens(col("text"))
    val nTokens = size(ws)
    val nDistinct = size(array_distinct(ws))
    val nStop = size(filter(ws, x => x.isin("a", "the")))
    val sumLen = aggregate(ws, lit(0), (acc, x) => acc + length(x))
    val ttr = nDistinct * 1.0 / nTokens
    val stopR = nStop * 1.0 / nTokens
    val avgLen = sumLen * 1.0 / nTokens
    Num.roundOut(lit(0.5) * ttr + lit(0.3) * (lit(1) - stopR)
      + lit(0.2) * least(avgLen / 8.0, lit(1.0)), 4)
  }

  /** Cavnar-Trenkle profile cap: each language keeps only its K most
    * frequent words, so the broadcast profile is ≤ K×langs rows FOREVER —
    * an uncapped per-word profile is O(vocab×langs) and a web-scale vocab
    * (10⁸+) outgrows any broadcast. */
  val ProfileK = 300

  /** The trained per-word rank profile = a model artifact, persisted
    * content-keyed ([[DerivedTable]]): train at ingest, broadcast to
    * score — retrained only when the corpus changes. Exposed for
    * TextAnalysisSpec's profile-size bound. */
  def langProfile(s: SparkSession, d: String): DataFrame = {
    val w = Tables.documents(s, d).select(col("lang"),
      explode(Text.tokens(col("text"))).as("word"))
    DerivedTable(s, d, "documents", "langprof") {
      val cnt = w.groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("t"))
      cnt.join(tot, "lang")
        // points are ranked over the FULL count table (distributed window,
        // fine at scale); only the broadcast artifact is capped
        .withColumn("points", lit(5) - row_number().over(
          Window.partitionBy(col("word"))
            .orderBy((col("c") * 1.0 / col("t")).desc, col("lang"))))
        .withColumn("krank", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("c").desc, col("word"))))
        .filter(col("krank") <= ProfileK)
        .select(col("lang").as("plang"), col("word"), col("points"))
    }
  }

  val entries: Seq[QueryDef] = Seq(

    // Language ID via corpus-trained rank-profile classifier (Cavnar-
    // Trenkle style, unigram profiles): for each word, langs are ranked by
    // relative frequency (ties → lang asc); each language's profile is
    // capped to its top-K words ([[ProfileK]]); a doc scores Σ points of
    // its tokens per lang (integer — exact, order-independent); argmax
    // with lang-asc tiebreak. All-relational: trainable at 100 TB,
    // bounded profiles broadcast back for scoring.
    QueryDef("x07_langid",
      """WITH w AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), cnt AS (
        |  SELECT lang, word, count(*) AS c FROM w GROUP BY 1, 2
        |), tot AS (
        |  SELECT lang AS lg, sum(c) AS t FROM cnt GROUP BY 1
        |), pts AS (
        |  SELECT lang AS plang, word, points FROM (
        |    SELECT lang, word,
        |           5 - row_number() OVER (PARTITION BY word
        |               ORDER BY c * 1.0 / t DESC, lang) AS points,
        |           row_number() OVER (PARTITION BY lang
        |               ORDER BY c DESC, word) AS krank
        |    FROM cnt JOIN tot ON cnt.lang = tot.lg
        |  ) WHERE krank <= 300
        |), scores AS (
        |  SELECT w.doc_id, p.plang, sum(p.points) AS score
        |  FROM w JOIN pts p ON w.word = p.word
        |  GROUP BY 1, 2
        |)
        |SELECT s.doc_id, d.lang AS actual, s.plang AS predicted,
        |       CAST(d.lang = s.plang AS INT) AS correct
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, plang) AS rn FROM scores) s
        |JOIN documents d ON d.doc_id = s.doc_id
        |WHERE s.rn = 1 ORDER BY s.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val w = docs.select(col("doc_id"), col("lang"),
        explode(Text.tokens(col("text"))).as("word"))
      val scores = w.join(broadcast(langProfile(s, d)), "word")
        .groupBy(col("doc_id"), col("plang"))
        .agg(sum(col("points")).as("score"))
      val best = scores.withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("plang"))))
        .filter(col("rn") === 1)
      best.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang").as("actual"),
          col("plang").as("predicted"),
          (col("lang") === col("plang")).cast("int").as("correct"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: type-token ratio, stopword ratio, token length —
    // exact rational metrics (integer counts + single divisions).
    QueryDef("x08_quality_score",
      s"""WITH $qualityMSql
        |SELECT doc_id, n_tokens,
        |       round(1e-9 + n_distinct * 1.0 / n_tokens, 4) AS ttr,
        |       round(1e-9 + n_stop * 1.0 / n_tokens, 4) AS stop_ratio,
        |       round(1e-9 + sum_len * 1.0 / n_tokens, 4) AS avg_token_len,
        |       $qualitySql AS quality
        |FROM m WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ws = Text.tokens(col("text"))
      val nTokens = size(ws)
      val nDistinct = size(array_distinct(ws))
      val nStop = size(filter(ws, x => x.isin("a", "the")))
      val sumLen = aggregate(ws, lit(0), (acc, x) => acc + length(x))
      val ttr = nDistinct * 1.0 / nTokens
      val stopR = nStop * 1.0 / nTokens
      val avgLen = sumLen * 1.0 / nTokens
      Tables.documents(s, d)
        .select(col("doc_id"), nTokens.as("n_tokens"),
          Num.roundOut(ttr, 4).as("ttr"),
          Num.roundOut(stopR, 4).as("stop_ratio"),
          Num.roundOut(avgLen, 4).as("avg_token_len"),
          qualityCol.as("quality"))
        .filter(col("n_tokens") > 0)
        .orderBy(col("doc_id"))
    },

    // Repetition-based quality filters (Gopher rules, Rae et al. 2021
    // §A1.1, adapted word-level since the fixture has no line structure):
    // duplicate-word / duplicate-n-gram fractions are pure column math;
    // the top-bigram coverage (most frequent bigram's share) is a
    // relational per-doc mode — explode → two partial-agg rounds — rather
    // than a per-row O(n²) lambda, so the heavy path stays codegen'd and
    // map-side-combined at any document length. Threshold flags compare
    // the UNROUNDED ratios (identical integer-derived doubles on both
    // engines — bit-identical classification).
    QueryDef("x21_repetition",
      """WITH b AS (
        |  SELECT doc_id, ws,
        |         CASE WHEN len(ws) < 2 THEN []
        |           ELSE list_transform(range(len(ws) - 1),
        |                i -> ws[i+1] || '_' || ws[i+2]) END AS g2,
        |         CASE WHEN len(ws) < 3 THEN []
        |           ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || '_' || ws[i+2] || '_' || ws[i+3]) END AS g3
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |), m AS (
        |  SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
        |         len(list_distinct(ws)) AS u_words,
        |         len(g2) AS n_g2, len(list_distinct(g2)) AS u_g2,
        |         len(g3) AS n_g3, len(list_distinct(g3)) AS u_g3, g2
        |  FROM b
        |), t AS (
        |  SELECT doc_id, max(c) AS top2 FROM (
        |    SELECT doc_id, g, count(*) AS c
        |    FROM (SELECT doc_id, unnest(g2) AS g FROM m) GROUP BY doc_id, g)
        |  GROUP BY doc_id
        |)
        |SELECT m.doc_id, m.n_words,
        |       round(1e-9 + 1 - u_words * 1.0 / n_words, 4) AS dup_word_frac,
        |       round(1e-9 + CASE WHEN n_g2 > 0 THEN 1 - u_g2 * 1.0 / n_g2
        |                    ELSE 0 END, 4) AS dup_2gram_frac,
        |       round(1e-9 + CASE WHEN n_g3 > 0 THEN 1 - u_g3 * 1.0 / n_g3
        |                    ELSE 0 END, 4) AS dup_3gram_frac,
        |       round(1e-9 + CASE WHEN n_g2 > 0
        |                    THEN coalesce(t.top2, 0) * 1.0 / n_g2
        |                    ELSE 0 END, 4) AS top_2gram_frac,
        |       (1 - u_words * 1.0 / n_words > 0.5
        |        OR CASE WHEN n_g2 > 0 THEN coalesce(t.top2, 0) * 1.0 / n_g2
        |           ELSE 0 END > 0.18) AS flagged
        |FROM m LEFT JOIN t ON m.doc_id = t.doc_id
        |WHERE n_words > 0 ORDER BY m.doc_id""".stripMargin) { (s, d) =>
      // materialize the three interpreted HOF gram arrays ONCE per row —
      // the size/distinct/explode consumers below would otherwise re-derive
      // them ~5× per document (lambdas have no CSE)
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), Text.tokens(col("text")).as("ws"),
          Text.rawShingles(col("text"), 2).as("g2"),
          Text.rawShingles(col("text"), 3).as("g3"))
        .localCheckpoint()
      val base = grams.select(col("doc_id"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("u_words"),
        size(col("g2")).as("n_g2"),
        size(array_distinct(col("g2"))).as("u_g2"),
        size(col("g3")).as("n_g3"),
        size(array_distinct(col("g3"))).as("u_g3"))
      val top2 = grams.select(col("doc_id"), explode(col("g2")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top2"))
      val dupWord = lit(1) - col("u_words") * 1.0 / col("n_words")
      val dupG2 = when(col("n_g2") > 0,
        lit(1) - col("u_g2") * 1.0 / col("n_g2")).otherwise(0.0)
      val dupG3 = when(col("n_g3") > 0,
        lit(1) - col("u_g3") * 1.0 / col("n_g3")).otherwise(0.0)
      val topFrac = when(col("n_g2") > 0,
        coalesce(col("top2"), lit(0L)) * 1.0 / col("n_g2")).otherwise(0.0)
      base.join(top2, Seq("doc_id"), "left")
        .filter(col("n_words") > 0)
        .select(col("doc_id"), col("n_words"),
          Num.roundOut(dupWord, 4).as("dup_word_frac"),
          Num.roundOut(dupG2, 4).as("dup_2gram_frac"),
          Num.roundOut(dupG3, 4).as("dup_3gram_frac"),
          Num.roundOut(topFrac, 4).as("top_2gram_frac"),
          (dupWord > 0.5 || topFrac > 0.18).as("flagged"))
        .orderBy(col("doc_id"))
    },

    // Token counting: whitespace tokens + BPE-ish ceil(len/4) subwords.
    QueryDef("x09_token_count",
      """SELECT doc_id,
        |       CAST(len(ws) AS INT) AS n_tokens,
        |       CAST(list_sum(list_transform(ws, w -> CAST(ceil(len(w) / 4.0) AS BIGINT)))
        |            AS BIGINT) AS n_subtokens,
        |       CAST(list_max(list_transform(ws, w -> len(w))) AS INT) AS max_token_len
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ws = Text.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(ws).as("n_tokens"),
          Text.subtokenCount(col("text")).as("n_subtokens"),
          array_max(transform(ws, w => length(w))).as("max_token_len"))
        .orderBy(col("doc_id"))
    },

    // Rolling-hash document fingerprint (poly mod 1e9+7, pinned fold order
    // replicated in the oracle via list_reduce).
    QueryDef("x10_fingerprint",
      s"""SELECT doc_id,
        |  $fingerprintSql AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      fingerprintTable(s, d).orderBy(col("doc_id"))
    },

    // Exact distinct counting (the oracle-checkable side of cardinality).
    QueryDef("x11_distinct_exact",
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    },

    // PII scrubbing / normalization: emails and URLs are injected
    // deterministically (the corpus has none), then scrubbed with
    // regexp_replace + whitespace collapse + lowercase — the text-cleaning
    // pass of a training pipeline, all codegen'd string ops.
    QueryDef("x16_scrub",
      """WITH dirty AS (
        |  SELECT doc_id,
        |         substring(text, 1, 40) || ' Contact user' || doc_id ||
        |         '@example.com  or   http://site.example/page' || doc_id AS raw
        |  FROM documents
        |)
        |SELECT doc_id,
        |       lower(trim(regexp_replace(regexp_replace(regexp_replace(raw,
        |         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        |         'https?://[^ ]+', '<URL>', 'g'),
        |         ' +', ' ', 'g'))) AS clean
        |FROM dirty ORDER BY doc_id""".stripMargin) { (s, d) =>
      val raw = concat(substring(col("text"), 1, 40),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@example.com  or   http://site.example/page"),
        col("doc_id").cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          lower(trim(regexp_replace(regexp_replace(regexp_replace(raw,
            "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
            "https?://[^ ]+", "<URL>"),
            " +", " "))).as("clean"))
        .orderBy(col("doc_id"))
    },

    // Deterministic content-hash train/val/test split (80/10/10) with
    // per-split stats — reuses the rolling-hash fingerprint so the split is
    // stable under re-ingestion and identical on any cluster.
    QueryDef("x17_split",
      s"""WITH fp AS (
        |  SELECT doc_id, n_chars,
        |    $fingerprintSql % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM fp GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        .join(fingerprintTable(s, d), "doc_id")
        .withColumn("bucket", col("fp") % 100)
        .select(col("n_chars"),
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))
    },

    // Sequence packing: concat-then-chunk documents into fixed token-budget
    // bins (the LLM-pretraining packing shape) — running token count over a
    // deterministic per-shard order, bin = cumulative-before / budget.
    // SHARDED: the window partitions by a content-hash shard (same stable
    // fingerprint as the x17 split), so the running sum runs per shard —
    // at 100 TB the shard count scales with the cluster (one packing task
    // per shard) instead of serializing the corpus through one global
    // window; bins are independent across shards by construction, exactly
    // how packed pretraining shards are written.
    QueryDef("x18_pack",
      s"""WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST($fingerprintSql % 4 AS INT) AS shard
        |  FROM documents
        |), c AS (
        |  SELECT shard, doc_id, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |           AS cum_before
        |  FROM t
        |)
        |SELECT shard, CAST(floor(cum_before / 2048.0) AS INT) AS bin,
        |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .join(fingerprintTable(s, d), "doc_id")
        .select((col("fp") % 4).cast("int").as("shard"), col("doc_id"),
          col("n_tokens"))
        .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("shard"),
          floor(col("cum_before") / 2048.0).cast("int").as("bin"),
          col("n_tokens"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
        .orderBy(col("shard"), col("bin"))
    },

    // Train/eval DECONTAMINATION: flag val/test documents sharing any
    // trigram shingle with the train split (the pre-training hygiene pass
    // that keeps benchmark answers out of the training set). Splits come
    // from the same stable content-hash as x17, shingles from the same
    // trigram definition as x04. Shape: explode eval shingles, equi-join
    // the DISTINCT train-gram set on the gram — work ∝ shared grams, an
    // all-relational shuffle join with no broadcast of the (huge at 100 TB)
    // train vocabulary; per-doc hit counts come back via one left join so
    // clean docs report 0.
    QueryDef("x19_decontaminate",
      s"""WITH sp AS (
        |  SELECT doc_id, text,
        |         CASE WHEN $fingerprintSql % 100 < 80 THEN 'train'
        |              WHEN $fingerprintSql % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, split,
        |         list_distinct(CASE WHEN len(ws) < 3 THEN []
        |           ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || '_' || ws[i+2] || '_' || ws[i+3]) END) AS tri
        |  FROM (SELECT doc_id, split, string_split(text, ' ') AS ws FROM sp)
        |), tg AS (
        |  SELECT DISTINCT unnest(tri) AS g FROM s WHERE split = 'train'
        |), ev AS (
        |  SELECT doc_id, split, CAST(len(tri) AS INT) AS n_grams
        |  FROM s WHERE split <> 'train'
        |), hits AS (
        |  SELECT e.doc_id, count(*) AS n
        |  FROM (SELECT doc_id, unnest(tri) AS g FROM s WHERE split <> 'train') e
        |  JOIN tg ON e.g = tg.g
        |  GROUP BY e.doc_id
        |)
        |SELECT ev.doc_id, ev.split, ev.n_grams,
        |       CAST(coalesce(h.n, 0) AS BIGINT) AS n_contam,
        |       round(1e-9 + CAST(coalesce(h.n, 0) AS DOUBLE)
        |             / greatest(ev.n_grams, 1), 4) AS contam_ratio
        |FROM ev LEFT JOIN hits h ON ev.doc_id = h.doc_id
        |ORDER BY ev.doc_id""".stripMargin) { (s, d) =>
      // fingerprint + shingles both come from persisted ingest artifacts
      // (the x04/x20 shingle table, the shared fingerprint table) — the
      // three consumers below re-read cheap parquet, not nested HOFs
      val sh = Dedup.shingleTable(s, d)
        .join(fingerprintTable(s, d), "doc_id")
        .withColumn("bucket", col("fp") % 100)
        .select(col("doc_id"),
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
            .otherwise("test").as("split"),
          col("tri"))
      val trainGrams = trainGramTable(s, d)
      val ev = sh.filter(col("split") =!= "train")
      val hits = ev.select(col("doc_id"), explode(col("tri")).as("g"))
        .join(trainGrams, "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      ev.select(col("doc_id"), col("split"), size(col("tri")).as("n_grams"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("split"), col("n_grams"),
          coalesce(col("n"), lit(0L)).as("n_contam"),
          Num.roundOut(coalesce(col("n"), lit(0L)).cast("double")
            / greatest(col("n_grams"), lit(1)), 4).as("contam_ratio"))
        .orderBy(col("doc_id"))
    },

    // Domain MIXING by temperature resampling (the data-mixture step of a
    // pretraining pipeline): target share per source q_s ∝ n_s^0.5
    // (α = 0.5 upweights rare domains), per-doc keep probability
    // p_s = min(1, q_s·N/n_s), membership decided by the same stable
    // content-hash bucket as x17 — deterministic, re-ingestion-stable,
    // and executed as one broadcast of a sources-sized rate table (no
    // per-doc randomness, no driver loop). Parity note: the sqrt weights
    // are floor-scaled to integers BEFORE summing, so the normalizing sum
    // is exact long arithmetic — order-independent on both engines; every
    // downstream double derives from identical long operands.
    QueryDef("x22_sample_mix",
      s"""WITH b AS (
        |  SELECT doc_id, source, $fingerprintSql % 1000000 AS bucket
        |  FROM documents
        |), c AS (
        |  SELECT source, count(*) AS n FROM b GROUP BY source
        |), w AS (
        |  SELECT source, n, CAST(floor(sqrt(n) * 1e6) AS BIGINT) AS w FROM c
        |), t AS (
        |  SELECT sum(w) AS sw, sum(n) AS tn FROM w
        |), r AS (
        |  SELECT source, n, least(1.0, (w * 1.0 / sw) * tn / n) AS p
        |  FROM w, t
        |), sm AS (
        |  SELECT b.source, count(*) AS ns
        |  FROM b JOIN r ON b.source = r.source
        |  WHERE b.bucket < p * 1000000.0
        |  GROUP BY b.source
        |)
        |SELECT r.source, r.n AS n_docs,
        |       round(1e-9 + p, 6) AS target_rate,
        |       CAST(coalesce(sm.ns, 0) AS BIGINT) AS n_sampled,
        |       round(1e-9 + coalesce(sm.ns, 0) * 1.0 / r.n, 4) AS achieved_rate
        |FROM r LEFT JOIN sm ON r.source = sm.source
        |ORDER BY r.source""".stripMargin) { (s, d) =>
      // the bucket comes from the persisted fingerprint table — both
      // subplans (rate trainer + sampler) re-read cheap parquet
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .join(fingerprintTable(s, d), "doc_id")
        .select(col("doc_id"), col("source"),
          (col("fp") % 1000000).as("bucket"))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val weights = counts
        .withColumn("w", floor(sqrt(col("n")) * 1e6).cast("long"))
      val tot = weights.agg(sum(col("w")).as("sw"), sum(col("n")).as("tn"))
      val rates = weights.crossJoin(broadcast(tot))
        .withColumn("p",
          least(lit(1.0), (col("w") * 1.0 / col("sw")) * col("tn") / col("n")))
        .select(col("source"), col("n"), col("p"))
      val sampled = docs.join(broadcast(rates), "source")
        .filter(col("bucket") < col("p") * 1000000.0)
        .groupBy(col("source")).agg(count(lit(1)).as("ns"))
      rates.join(sampled, Seq("source"), "left")
        .select(col("source"), col("n").as("n_docs"),
          Num.roundOut(col("p"), 6).as("target_rate"),
          coalesce(col("ns"), lit(0L)).as("n_sampled"),
          Num.roundOut(coalesce(col("ns"), lit(0L)) * 1.0 / col("n"), 4)
            .as("achieved_rate"))
        .orderBy(col("source"))
    },

    // Unigram-LM likelihood scoring (the KenLM-filter stand-in): train
    // add-one-smoothed unigram counts on the x17 train split, score every
    // document by average token probability + OOV rate. Kept RATIONAL on
    // purpose: log-space perplexity would sum libm logarithms, and
    // Math.log vs DuckDB's C log are not bit-stable cross-engine — every
    // column here derives from exact long arithmetic plus one final
    // division, so the oracle hash can't drift. Scale shape: the model is
    // the global top-K (K=1000) counts via TakeOrderedAndProject
    // (distributed partial top-k, q24's plan) broadcast to the scorer;
    // everything outside the cap scores as OOV (numerator 1), the same
    // bounded-broadcast contract as x07's profile cap. Scoring is one
    // broadcast left join + per-doc partial aggs — embarrassingly
    // parallel at any corpus size.
    QueryDef("x23_unigram_lm",
      s"""WITH sp AS (
        |  SELECT doc_id, text,
        |         CASE WHEN $fingerprintSql % 100 < 80 THEN 'train'
        |              WHEN $fingerprintSql % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, split, unnest(string_split(text, ' ')) AS word
        |  FROM sp
        |), c AS (
        |  SELECT word, count(*) AS c FROM tok WHERE split = 'train'
        |  GROUP BY word
        |), vs AS (
        |  SELECT count(*) AS v, CAST(sum(c) AS BIGINT) AS t FROM c
        |), topk AS (
        |  SELECT word, c FROM c ORDER BY c DESC, word LIMIT 1000
        |), per AS (
        |  SELECT tok.doc_id, count(*) AS n,
        |         sum(CASE WHEN k.word IS NULL THEN 1 ELSE 0 END) AS n_oov,
        |         CAST(sum(coalesce(k.c, 0)) AS BIGINT) AS sum_c
        |  FROM tok LEFT JOIN topk k ON tok.word = k.word
        |  GROUP BY tok.doc_id
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |       CAST(n_oov AS BIGINT) AS n_oov, sum_c,
        |       round(1e-9 + n_oov * 1.0 / n, 4) AS oov_rate,
        |       round(1e-9 + (sum_c + n) * 1.0 / (n * (t + v)), 6) AS avg_prob
        |FROM per, vs ORDER BY doc_id""".stripMargin) { (s, d) =>
      // split buckets come from the persisted fingerprint table; trainer
      // and scorer each re-read cheap parquet
      val sp = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .join(fingerprintTable(s, d), "doc_id")
        .withColumn("bucket", col("fp") % 100)
        .select(col("doc_id"),
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
            .otherwise("test").as("split"),
          col("text"))
      val tok = sp.select(col("doc_id"), col("split"),
        explode(Text.tokens(col("text"))).as("word"))
      val counts = tok.filter(col("split") === "train")
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds the vocab stats AND the top-k model
      val vstats = counts.agg(count(lit(1)).as("v"), sum(col("c")).as("t"))
      val model = counts.orderBy(col("c").desc, col("word")).limit(1000)
      val per = tok
        .join(broadcast(model.withColumnRenamed("c", "kc")), Seq("word"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("kc").isNull, 1).otherwise(0)).as("n_oov"),
          sum(coalesce(col("kc"), lit(0L))).as("sum_c"))
      per.crossJoin(broadcast(vstats))
        .select(col("doc_id"), col("n").as("n_tokens"), col("n_oov"),
          col("sum_c"),
          Num.roundOut(col("n_oov") * 1.0 / col("n"), 4).as("oov_rate"),
          Num.roundOut((col("sum_c") + col("n")) * 1.0
            / (col("n") * (col("t") + col("v"))), 6).as("avg_prob"))
        .orderBy(col("doc_id"))
    },

    // CCNet-style QUALITY BUCKETING: rank every document by its unigram-LM
    // likelihood (x23's model and score, CTEs mirrored verbatim) and split
    // the corpus into head/middle/tail tertiles — the language-model
    // filtering step that decides which web text trains and which is
    // discarded. Ordering uses the UNROUNDED avg_prob (identical doubles
    // on both engines — every operand derives from exact long arithmetic)
    // with doc_id tiebreak, so the tertile assignment is deterministic.
    //
    // Scale: a bare ntile(3) would funnel every document's score through
    // ONE reducer (VERDICT r8 item 2). The global rank instead runs as
    // [[Ranks.twoPassRank]] over order-preserving −ln(p) ranges (exact,
    // parallel; strictly stronger than the sampled-threshold swap SCALING
    // originally recorded because the oracle's plain ntile stays
    // untouched), and ntile's bucket arithmetic — tile sizes
    // ⌈n/3⌉/⌊n/3⌋ from one broadcast count — becomes a stateless CASE.
    QueryDef("x35_ppl_buckets",
      s"""WITH sp AS (
        |  SELECT doc_id, text,
        |         CASE WHEN $fingerprintSql % 100 < 80 THEN 'train'
        |              WHEN $fingerprintSql % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, split, unnest(string_split(text, ' ')) AS word
        |  FROM sp
        |), c AS (
        |  SELECT word, count(*) AS c FROM tok WHERE split = 'train'
        |  GROUP BY word
        |), vs AS (
        |  SELECT count(*) AS v, CAST(sum(c) AS BIGINT) AS t FROM c
        |), topk AS (
        |  SELECT word, c FROM c ORDER BY c DESC, word LIMIT 1000
        |), per AS (
        |  SELECT tok.doc_id, count(*) AS n,
        |         CAST(sum(coalesce(k.c, 0)) AS BIGINT) AS sum_c
        |  FROM tok LEFT JOIN topk k ON tok.word = k.word
        |  GROUP BY tok.doc_id
        |), scored AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |         (sum_c + n) * 1.0 / (n * (t + v)) AS p
        |  FROM per, vs
        |)
        |SELECT doc_id, n_tokens, round(1e-9 + p, 6) AS avg_prob,
        |       CASE ntile(3) OVER (ORDER BY p DESC, doc_id)
        |         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
        |       END AS bucket
        |FROM scored ORDER BY doc_id""".stripMargin) { (s, d) =>
      val sp = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .join(fingerprintTable(s, d), "doc_id")
        .withColumn("bucket", col("fp") % 100)
        .select(col("doc_id"),
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
            .otherwise("test").as("split"),
          col("text"))
      val tok = sp.select(col("doc_id"), col("split"),
        explode(Text.tokens(col("text"))).as("word"))
      val counts = tok.filter(col("split") === "train")
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val vstats = counts.agg(count(lit(1)).as("v"), sum(col("c")).as("t"))
      val model = counts.orderBy(col("c").desc, col("word")).limit(1000)
      val per = tok
        .join(broadcast(model.withColumnRenamed("c", "kc")), Seq("word"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(coalesce(col("kc"), lit(0L))).as("sum_c"))
      val scored = per.crossJoin(broadcast(vstats))
        .select(col("doc_id"), col("n").as("n_tokens"),
          ((col("sum_c") + col("n")) * 1.0
            / (col("n") * (col("t") + col("v")))).as("p"))
        .localCheckpoint() // read by the rank's both passes + the count
      val nTot = scored.agg(count(lit(1)).as("nn"))
      // −ln(p) coarsens p into 64 order-preserving buckets (p ∈ (0, 1);
      // equal p → equal bucket, so the tiebreak never straddles buckets);
      // the bucket value is internal — no cross-engine float parity needed
      val ranked = Ranks.twoPassRank(scored, Nil,
        least(greatest(floor(-log(col("p")) * 4), lit(0)), lit(63))
          .cast("int"),
        Seq(col("p").desc, col("doc_id")))
      ranked.crossJoin(broadcast(nTot))
        .select(col("doc_id"), col("n_tokens"),
          Num.roundOut(col("p"), 6).as("avg_prob"),
          when(col("rn") <= expr("nn div 3 + least(nn % 3, 1)"), "head")
            .when(col("rn") <= expr("2 * (nn div 3) + least(nn % 3, 2)"),
              "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    },

    // URL/domain-based filtering (the C4-style cleaning step): extract the
    // host from each document's URL, aggregate per domain, and classify
    // against a blocklist. The fixture has no URL column, so one is
    // synthesized deterministically per doc (same device as x16's PII
    // fixture); extraction is a codegen'd regexp, the blocklist is a
    // broadcast left join against a literal table (at web scale the
    // blocklist is a real dim table, and a broadcast join — not a giant
    // isin literal — is the shape that survives a million-entry list).
    QueryDef("x25_domain_filter",
      """WITH u AS (
        |  SELECT doc_id,
        |         text || ' see http://site' || CAST(doc_id % 20 AS VARCHAR)
        |              || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents
        |), dm AS (
        |  SELECT doc_id, regexp_extract(t, 'https?://([^/ ]+)', 1) AS domain
        |  FROM u
        |), bl AS (
        |  SELECT * FROM (VALUES ('site3.example.com'), ('site7.example.com'),
        |                        ('site11.example.com')) AS b(domain)
        |)
        |SELECT dm.domain, count(*) AS n_docs,
        |       (bl.domain IS NOT NULL) AS blocked
        |FROM dm LEFT JOIN bl ON dm.domain = bl.domain
        |GROUP BY dm.domain, bl.domain ORDER BY dm.domain""".stripMargin) { (s, d) =>
      import s.implicits._
      val withUrl = Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" see http://site"),
            (col("doc_id") % 20).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string")).as("t"))
      val domains = withUrl
        .select(col("doc_id"),
          regexp_extract(col("t"), "https?://([^/ ]+)", 1).as("domain"))
      val blocklist = Seq("site3.example.com", "site7.example.com",
        "site11.example.com").toDF("b_domain")
      domains.join(broadcast(blocklist),
          col("domain") === col("b_domain"), "left")
        .groupBy(col("domain"), col("b_domain"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("domain"), col("n_docs"),
          col("b_domain").isNotNull.as("blocked"))
        .orderBy(col("domain"))
    },

    // Dataset profiling: per-column null/distinct/min/max in ONE pass
    // (conditional aggregation, no per-column scans) — the data-quality
    // report every ingest pipeline runs before training.
    QueryDef("x15_profile",
      """SELECT 'events' AS table_name, count(*) AS n_rows,
        |       count(*) - count(user_id) AS user_id_nulls,
        |       count(DISTINCT user_id) AS user_id_distinct,
        |       count(*) - count(event_type) AS event_type_nulls,
        |       count(DISTINCT event_type) AS event_type_distinct,
        |       count(*) - count(value) AS value_nulls,
        |       round(1e-9 + min(value), 4) AS value_min,
        |       round(1e-9 + max(value), 4) AS value_max,
        |       count(*) - count(props) AS props_nulls
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("user_id"))).as("user_id_nulls"),
        countDistinct(col("user_id")).as("user_id_distinct"),
        (count(lit(1)) - count(col("event_type"))).as("event_type_nulls"),
        countDistinct(col("event_type")).as("event_type_distinct"),
        (count(lit(1)) - count(col("value"))).as("value_nulls"),
        Num.roundOut(min(col("value")), 4).as("value_min"),
        Num.roundOut(max(col("value")), 4).as("value_max"),
        (count(lit(1)) - count(col("props"))).as("props_nulls"))
        .select(lit("events").as("table_name"), col("*"))
    },

    // HLL-sketch approximate distinct — the at-scale path (no exact-
    // distinct shuffle). Sketch values are engine-specific → no oracle;
    // TextAnalysisSpec bounds the relative error against x11.
    QueryDef.noOracle("x12_distinct_approx") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    },

    // PORTABLE HyperLogLog WITH small-range correction — x12's
    // oracle-checkable twin (the x02→x39 move applied to cardinality):
    // m=256 registers over distinct users in the events stream. The key
    // runs through the published hash32 mixer (h = ((h>>16)^h)·0x45d9f3b
    // twice + a final fold — the constant is < 2^27 so every product
    // fits a BIGINT under ANSI mode; DuckDB spells xor()/>>/&, Spark
    // ^/shiftright/&, same semantics), because HLL needs avalanche in
    // the top bits — a mod-prime multiplicative "hash" of sequential ids
    // left rel_err at 0.4-2.9 before this. register = h mod 256; rho =
    // leading-zero rank of h div 256 in its 24-bit budget via
    // length(bin(v)) — bin() exists verbatim on both engines, so every
    // REGISTER is relationally recomputed by the oracle (register value
    // = max rho over colliding keys, order-independent like x54's
    // cells). The harmonic sum runs in EXACT INTEGERS (Σ 2^(25−M_j),
    // each term a long), and the LinearCounting correction (raw ≤ 2.5m
    // with empty registers → m·ln(m/V), Flajolet et al. 2007) reads ln
    // from a 255-entry table GENERATED ONCE in Scala and interpolated
    // into both engines — runtime libm never runs, so the branch and the
    // value are bit-identical. Measured: rel_err 3.0% / 1.8% / 2.3% at
    // sf0.001/0.01/0.1 (the first two in the LC regime, the last raw —
    // both estimator branches exercised and hash-checked).
    //
    // Scale: the aggregate state is 256 registers per partition partial
    // (max merges), the exchange carries ≤256 rows after map-side
    // combine — the exact-distinct shuffle (one key per distinct value)
    // never happens, which is the entire point of HLL at 10^9+ keys.
    QueryDef("x62_hll_portable", x62OracleSql) { (s, d) =>
      // Mixer/register/estimate live in hllRegRho/hllEstimate (shared with
      // st12's streaming fold — one definition, batch and stream can't
      // drift). The oracle SQL is likewise the shared x62OracleSql.
      val ev = Tables.events(s, d).select(col("user_id")).localCheckpoint()
      hllEstimate(s, hllRegRho(ev),
        ev.agg(countDistinct(col("user_id")).as("n_exact")))
    },

    // VOCABULARY DRIFT between two corpus halves (doc_id parity split —
    // deterministic and balanced): per-term 2×2 chi-square statistic, the
    // domain-shift audit run before mixing a new crawl snapshot into a
    // training corpus (a drifting term means the snapshots use language
    // differently — route to per-source curation, not blind mixing).
    // chi² = N·(ad−bc)²/((a+b)(c+d)·NA·NB) with a/b the term's counts in
    // halves A/B and c/d the complements. EVERY operand is an exact
    // integer; the statistic is formed in IEEE double with ONE pinned
    // association (((N·diff)·diff)/(((ab·cd)·NA)·NB)) mirrored verbatim
    // in the oracle, so both engines produce bit-identical doubles
    // (integer inputs < 2^53 convert exactly; each subsequent op is one
    // deterministic IEEE rounding — the x23 libm lesson does not apply
    // because no transcendental ever runs).
    //
    // Scale: one token pass → (word)-keyed partial agg (map-side
    // combine); the totals row is a 1-row broadcast; min-support ≥ 20
    // prunes the long tail BEFORE the statistic; top-30 is
    // TakeOrderedAndProject (per-partition top-k, no global sort).
    QueryDef("x90_vocab_shift",
      """WITH tok AS (
        |  SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), c AS (
        |  SELECT word,
        |         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM tok GROUP BY word
        |), t AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
        |  FROM c
        |), x AS (
        |  SELECT word, a, b,
        |         CAST(a AS DOUBLE) * (t.nb - b)
        |           - CAST(b AS DOUBLE) * (t.na - a) AS diff,
        |         CAST(a + b AS DOUBLE) AS ab,
        |         CAST((t.na - a) + (t.nb - b) AS DOUBLE) AS cd,
        |         CAST(t.na AS DOUBLE) AS nad, CAST(t.nb AS DOUBLE) AS nbd,
        |         CAST(t.na + t.nb AS DOUBLE) AS n
        |  FROM c, t WHERE a + b >= 20
        |)
        |SELECT word, a, b,
        |       CASE WHEN diff > 0 THEN 'A' ELSE 'B' END AS over_half,
        |       round(1e-9 + n * diff * diff / (ab * cd * nad * nbd), 4) AS chi2
        |FROM x ORDER BY chi2 DESC, word LIMIT 30""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select((col("doc_id") % 2).as("half"),
          explode(Text.tokens(col("text"))).as("word"))
      val c = tok.groupBy(col("word")).agg(
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("b"))
      val t = c.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
      val x = c.crossJoin(broadcast(t))
        .filter(col("a") + col("b") >= 20)
        .withColumn("diff",
          col("a").cast("double") * (col("nb") - col("b"))
            - col("b").cast("double") * (col("na") - col("a")))
        .withColumn("ab", (col("a") + col("b")).cast("double"))
        .withColumn("cd",
          ((col("na") - col("a")) + (col("nb") - col("b"))).cast("double"))
        .withColumn("nad", col("na").cast("double"))
        .withColumn("nbd", col("nb").cast("double"))
        .withColumn("n", (col("na") + col("nb")).cast("double"))
      x.select(col("word"), col("a"), col("b"),
          when(col("diff") > 0, "A").otherwise("B").as("over_half"),
          Num.roundOut(
            col("n") * col("diff") * col("diff")
              / (col("ab") * col("cd") * col("nad") * col("nbd")), 4)
            .as("chi2"))
        .orderBy(col("chi2").desc, col("word"))
        .limit(30)
    },

    // x62's portable HLL GROUPED — one 256-register sketch per event_type,
    // the per-dimension-cell layout a warehouse materializes (distinct
    // users per (type, day, …) served from O(256) mergeable state per
    // cell, never a distinct-count scan). Identical mixer/register/rho
    // pipeline as x62; the register spine is types × 256 so empty
    // registers exist per group; each group picks its own
    // linear-counting-vs-raw regime. The exact arm rides along per group
    // as calibration (the x79 pattern).
    //
    // Scale: partial state is max-per-(type, reg) — 256 counters per
    // group merge across any partitioning (THE grouped-sketch contract);
    // the estimate math runs on groups × 256 rows, driver-tiny at any
    // corpus size. Register max is insertion-order-free, so the same
    // sketch falls out on any cluster.
    QueryDef("x85_hll_grouped",
      s"""WITH du AS (
        |  SELECT event_type, user_id FROM events
        |), h0 AS (
        |  SELECT event_type, user_id & 4294967295 AS a FROM du
        |), h1 AS (
        |  SELECT event_type, (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h0
        |), h2 AS (
        |  SELECT event_type, (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h1
        |), hv AS (
        |  SELECT event_type, xor(a >> 16, a) AS h FROM h2
        |), rr AS (
        |  SELECT event_type, CAST(h % 256 AS INT) AS reg,
        |         CASE WHEN h // 256 = 0 THEN 25
        |              ELSE CAST(25 - len(bin(h // 256)) AS INT) END AS rho
        |  FROM hv
        |), spine AS (
        |  SELECT t.event_type, r.reg
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT CAST(unnest(range(256)) AS INT) AS reg) r
        |), regs AS (
        |  SELECT spine.event_type, spine.reg,
        |         CAST(coalesce(max(rr.rho), 0) AS INT) AS m
        |  FROM spine LEFT JOIN rr
        |    ON rr.event_type = spine.event_type AND rr.reg = spine.reg
        |  GROUP BY spine.event_type, spine.reg
        |), agg AS (
        |  SELECT event_type,
        |         CAST(sum(1::BIGINT << (25 - m)) AS BIGINT) AS intsum,
        |         CAST(sum(m) AS BIGINT) AS sum_m,
        |         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |  FROM regs GROUP BY 1
        |), lnt(zv, lnv) AS (
        |  VALUES $hllLnValuesSql
        |), fin AS (
        |  SELECT agg.event_type, agg.sum_m, agg.n_zero,
        |         0.7183 * 65536 * 33554432 / agg.intsum AS raw, lnt.lnv
        |  FROM agg LEFT JOIN lnt ON lnt.zv = agg.n_zero
        |), ex AS (
        |  SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1
        |)
        |SELECT fin.event_type, ex.n_exact, fin.sum_m, fin.n_zero,
        |       CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
        |            THEN 'lc' ELSE 'raw' END AS regime,
        |       round(1e-9 + CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
        |             THEN 256 * fin.lnv ELSE fin.raw END, 4) AS hll_est,
        |       round(1e-9 + abs(CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
        |             THEN 256 * fin.lnv ELSE fin.raw END - ex.n_exact)
        |             / ex.n_exact, 4) AS rel_err
        |FROM fin JOIN ex ON ex.event_type = fin.event_type
        |ORDER BY fin.event_type""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).localCheckpoint()
      val hv = ev
        .select(col("event_type"), expr("user_id & 4294967295").as("a"))
        .select(col("event_type"),
          expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295").as("a"))
        .select(col("event_type"),
          expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295").as("a"))
        .select(col("event_type"), expr("shiftright(a, 16) ^ a").as("h"))
      val rr = hv.select(col("event_type"),
        (col("h") % 256).cast("int").as("reg"),
        when(expr("h div 256") === 0, 25)
          .otherwise(lit(25) - length(bin(expr("h div 256"))))
          .cast("int").as("rho"))
      val types = ev.select(col("event_type")).distinct()
      val spine = types.crossJoin(
        broadcast(s.range(256).select(col("id").cast("int").as("reg"))))
      val regs = spine
        .join(rr.groupBy(col("event_type"), col("reg"))
          .agg(max(col("rho")).as("mr")), Seq("event_type", "reg"), "left")
        .select(col("event_type"),
          coalesce(col("mr"), lit(0)).cast("int").as("m"))
      val agg = regs.groupBy(col("event_type")).agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 25 - m)")).as("intsum"),
        sum(col("m")).cast("long").as("sum_m"),
        sum(when(col("m") === 0, 1L).otherwise(0L)).as("n_zero"))
      val ex = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      val raw = lit(0.7183) * 65536 * 33554432 / col("intsum")
      val isLc = raw <= 640 && col("n_zero") > 0
      val est = when(isLc, lit(256.0) * col("lnv")).otherwise(raw)
      agg.join(broadcast(hllLnTable.toDF("zv", "lnv")),
          col("n_zero") === col("zv"), "left")
        .join(ex, "event_type")
        .select(col("event_type"), col("n_exact"), col("sum_m"), col("n_zero"),
          when(isLc, "lc").otherwise("raw").as("regime"),
          Num.roundOut(est, 4).as("hll_est"),
          Num.roundOut(abs(est - col("n_exact")) / col("n_exact"), 4)
            .as("rel_err"))
        .orderBy(col("event_type"))
    },

    // ROLLING-WINDOW DISTINCT via DAILY SKETCH MERGE — the pattern that
    // makes "7-day active users" affordable at 100 TB: persist ONE
    // 256-register HLL per day at ingest (a fixed 256-row artifact per
    // day, x62's portable mixer), then ANY trailing window is a
    // register-wise max-merge of the covered days — no rescan of raw
    // events, no exact distinct over a week of data, and the same daily
    // sketches serve 7-day, 28-day, or arbitrary ranges. Each daily
    // register row fans out to the ≤7 target days it covers via an
    // exploded day-offset equi-join (shuffle ∝ days × 256, never event
    // grain). The exact 7-day distinct rides along as the calibration
    // column (x85's protocol) with the error-regime choice (raw vs
    // LinearCounting through the shared compiled ln-table).
    //
    // Scale: raw events are touched once (the daily register build —
    // map-side max-combine); everything downstream is (days × 256)-sized.
    // This is the x62→x85 progression completed: global sketch →
    // grouped sketches → time-windowed sketch ALGEBRA.
    QueryDef("x132_hll_rolling",
      s"""WITH du AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id FROM events
        |), h0 AS (
        |  SELECT day, user_id & 4294967295 AS a FROM du
        |), h1 AS (
        |  SELECT day, (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h0
        |), h2 AS (
        |  SELECT day, (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h1
        |), hv AS (
        |  SELECT day, xor(a >> 16, a) AS h FROM h2
        |), rr AS (
        |  SELECT day, CAST(h % 256 AS INT) AS reg,
        |         CASE WHEN h // 256 = 0 THEN 25
        |              ELSE CAST(25 - len(bin(h // 256)) AS INT) END AS rho
        |  FROM hv
        |), daily AS (
        |  SELECT day, reg, CAST(max(rho) AS INT) AS m
        |  FROM rr GROUP BY day, reg
        |), fan AS (
        |  SELECT daily.day + CAST(o.o AS INT) AS target, daily.reg, daily.m
        |  FROM daily CROSS JOIN
        |       (SELECT unnest(range(7)) AS o) o
        |), days AS (SELECT DISTINCT day FROM du),
        |spine AS (
        |  SELECT days.day, r.reg
        |  FROM days CROSS JOIN (SELECT CAST(unnest(range(256)) AS INT) AS reg) r
        |), regs AS (
        |  SELECT spine.day, spine.reg,
        |         CAST(coalesce(max(fan.m), 0) AS INT) AS m
        |  FROM spine LEFT JOIN fan
        |    ON fan.target = spine.day AND fan.reg = spine.reg
        |  GROUP BY spine.day, spine.reg
        |), agg AS (
        |  SELECT day,
        |         CAST(sum(1::BIGINT << (25 - m)) AS BIGINT) AS intsum,
        |         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_zero
        |  FROM regs GROUP BY 1
        |), lnt(zv, lnv) AS (
        |  VALUES $hllLnValuesSql
        |), fin AS (
        |  SELECT agg.day, agg.n_zero,
        |         0.7183 * 65536 * 33554432 / agg.intsum AS raw, lnt.lnv
        |  FROM agg LEFT JOIN lnt ON lnt.zv = agg.n_zero
        |), ex AS (
        |  SELECT d.day, count(DISTINCT du.user_id) AS n_exact
        |  FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day
        |)
        |SELECT fin.day, ex.n_exact, fin.n_zero,
        |       CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
        |            THEN 'lc' ELSE 'raw' END AS regime,
        |       round(1e-9 + CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
        |             THEN 256 * fin.lnv ELSE fin.raw END, 4) AS hll_est,
        |       round(1e-9 + abs(CASE WHEN fin.raw <= 640 AND fin.n_zero > 0
        |             THEN 256 * fin.lnv ELSE fin.raw END - ex.n_exact)
        |             / ex.n_exact, 4) AS rel_err
        |FROM fin JOIN ex ON ex.day = fin.day
        |ORDER BY fin.day""".stripMargin) { (s, d) =>
      import s.implicits._
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .localCheckpoint() // feeds the sketch build AND the exact column
      val hv = du
        .select(col("day"), expr("user_id & 4294967295").as("a"))
        .select(col("day"),
          expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295").as("a"))
        .select(col("day"),
          expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295").as("a"))
        .select(col("day"), expr("shiftright(a, 16) ^ a").as("h"))
      val daily = hv.select(col("day"),
          (col("h") % 256).cast("int").as("reg"),
          when(expr("h div 256") === 0, 25)
            .otherwise(lit(25) - length(bin(expr("h div 256"))))
            .cast("int").as("rho"))
        .groupBy(col("day"), col("reg")).agg(max(col("rho")).as("m"))
      val fan = daily
        .select(col("reg"), col("m"),
          explode(sequence(lit(0), lit(6))).as("o"), col("day"))
        .select(expr("date_add(day, o)").as("day"), col("reg"), col("m"))
      val days = du.select(col("day")).distinct()
      val spine = days.crossJoin(
        broadcast(s.range(256).select(col("id").cast("int").as("reg"))))
      val regs = spine
        .join(fan.groupBy(col("day"), col("reg")).agg(max(col("m")).as("mr")),
          Seq("day", "reg"), "left")
        .select(col("day"), coalesce(col("mr"), lit(0)).cast("int").as("m"))
      val agg = regs.groupBy(col("day")).agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 25 - m)")).as("intsum"),
        sum(when(col("m") === 0, 1L).otherwise(0L)).as("n_zero"))
      val ex = days.as("t")
        .join(du.as("u"),
          col("u.day").between(expr("date_sub(t.day, 6)"), col("t.day")))
        .groupBy(col("t.day").as("day"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      val raw = lit(0.7183) * 65536 * 33554432 / col("intsum")
      val isLc = raw <= 640 && col("n_zero") > 0
      val est = when(isLc, lit(256.0) * col("lnv")).otherwise(raw)
      agg.join(broadcast(hllLnTable.toDF("zv", "lnv")),
          col("n_zero") === col("zv"), "left")
        .join(ex, "day")
        .select(col("day"), col("n_exact"), col("n_zero"),
          when(isLc, "lc").otherwise("raw").as("regime"),
          Num.roundOut(est, 4).as("hll_est"),
          Num.roundOut(abs(est - col("n_exact")) / col("n_exact"), 4)
            .as("rel_err"))
        .orderBy(col("day"))
    },

    // TF-IDF keyword extraction (top-3 terms per document) — the corpus-
    // statistics scoring step behind topic tagging / keyword filtering.
    // idf is the RATIONAL N/df (no log): libm log() is not bit-stable
    // across engines (x23's lesson), and a monotone transform of N/df
    // ranks identically, so score = (tf·N)/(n_tokens·df) — every operand
    // an exact integer, the one division the only FP op → bit-identical
    // on both engines, and rank ties broken by word.
    //
    // Scale: tf is one row per (doc, word) — the token explode collapses
    // map-side (partial agg) before the (doc_id, word) shuffle. The df
    // join ships one row per word on the build side but up to N rows per
    // word on the probe side (stopwords!); since the build side is a
    // single row per key the join output never explodes, and AQE's skew
    // split handles the reducer imbalance (PlanShapeSpec pins that path
    // on q27's shape). The identical tf subplan under both consumers is
    // planned once via ReuseExchange.
    QueryDef("x26_tfidf",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word
        |), dl AS (
        |  SELECT doc_id, word, tf,
        |         sum(tf) OVER (PARTITION BY doc_id) AS n_tokens
        |  FROM tf
        |), dfq AS (
        |  SELECT word, count(*) AS df FROM tf GROUP BY word
        |), nn AS (
        |  SELECT count(*) AS n FROM documents
        |), sc AS (
        |  SELECT dl.doc_id, dl.word, dl.tf, dfq.df,
        |         (dl.tf * nn.n) * 1.0 / (dl.n_tokens * dfq.df) AS score
        |  FROM dl JOIN dfq ON dl.word = dfq.word, nn
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, word) AS rank
        |  FROM sc
        |)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, tf, df,
        |       round(1e-9 + score, 6) AS score
        |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("word"))
      val tf = tok.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val dl = tf.withColumn("n_tokens",
        sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      val dfq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val nn = docs.agg(count(lit(1)).as("nn"))
      dl.join(dfq, Seq("word"))
        .crossJoin(broadcast(nn))
        .withColumn("score",
          (col("tf") * col("nn")).cast("double")
            / (col("n_tokens") * col("df")))
        .withColumn("rank",
          row_number().over(Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("word"))).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"), col("tf"),
          col("df"), Num.roundOut(col("score"), 6).as("score"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // Quantile SKETCH — the at-scale percentile path. q32's exact
    // percentile materializes and sorts every group member on one reducer;
    // the KLL-style sketch behind approx_percentile is fixed-size and
    // MERGEABLE, so executors fold their partitions locally and only
    // sketches cross the exchange — same contract as x12's HLL vs x11.
    // Rank error is ε=1/accuracy; sketch internals are engine-specific →
    // no oracle; ExtensionSpec bounds the error against q32's exact
    // values.
    QueryDef.noOracle("x27_quantile_sketch") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          approx_percentile(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
          approx_percentile(col("value"), lit(0.95), lit(10000)).as("p95_approx"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // PORTABLE sampled quantiles — x27's oracle-checkable twin (the
    // x02→x39/x12→x62 move applied to percentiles): a bottom-k-by-hash-
    // priority uniform sample (bottom-k sketches, Cohen & Kaplan 2007)
    // per event_type, k=64. Priority = x62's integer mixer over event_id
    // — no RNG, so the sample is deterministic under re-ingestion (x17/
    // x22's contract) and MERGEABLE by construction: bottom-k of a union
    // is bottom-k of the per-part bottom-k's (SampleMergeSpec pins it).
    // Quantile indexes are EXACT INTEGERS (ceil(q·n) = (q_num·n + q_num)
    // div q_den — float 0.9·n rounds up on some n), ties broken by
    // event_id, so every sampled value and both estimates are
    // relationally recomputed by DuckDB and hash-checked.
    //
    // Scale: the Spark side selects in TWO levels — bottom-64 within
    // (event_type, event_id mod 32 salt), then bottom-64 of the ≤ 32·64
    // survivors — provably equal to the single global window (priority
    // order is total), so no reducer ever sorts a whole group: the same
    // salting lever as q27, applied to top-k selection. The oracle runs
    // the single-window form; result parity IS the equivalence proof,
    // run per round. The exact side sorts each group once (q32's cost) —
    // that's the comparison baseline, not the at-scale path.
    QueryDef("x64_quantile_sample",
      """WITH ev AS (
        |  SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL
        |), h0 AS (
        |  SELECT event_type, event_id, value,
        |         event_id & 4294967295 AS a FROM ev
        |), h1 AS (
        |  SELECT event_type, event_id, value,
        |         (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h0
        |), h2 AS (
        |  SELECT event_type, event_id, value,
        |         (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h1
        |), pv AS (
        |  SELECT event_type, event_id, value, xor(a >> 16, a) AS pri FROM h2
        |), samp AS (
        |  SELECT event_type, event_id, value FROM (
        |    SELECT event_type, event_id, value,
        |           row_number() OVER (PARTITION BY event_type
        |                              ORDER BY pri, event_id) AS rn
        |    FROM pv) WHERE rn <= 64
        |), sq AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS vr,
        |         count(*) OVER (PARTITION BY event_type) AS ns
        |  FROM samp
        |), sest AS (
        |  SELECT event_type, max(ns) AS n_sample,
        |         max(CASE WHEN vr = (ns + 1) // 2 THEN value END) AS p50s,
        |         max(CASE WHEN vr = (9 * ns + 9) // 10 THEN value END) AS p90s
        |  FROM sq GROUP BY 1
        |), eq AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS vr,
        |         count(*) OVER (PARTITION BY event_type) AS nr
        |  FROM ev
        |), eest AS (
        |  SELECT event_type, max(nr) AS n_rows,
        |         max(CASE WHEN vr = (nr + 1) // 2 THEN value END) AS p50e,
        |         max(CASE WHEN vr = (9 * nr + 9) // 10 THEN value END) AS p90e
        |  FROM eq GROUP BY 1
        |)
        |SELECT s.event_type, e.n_rows, s.n_sample,
        |       round(1e-9 + s.p50s, 4) AS p50_sample,
        |       round(1e-9 + s.p90s, 4) AS p90_sample,
        |       round(1e-9 + e.p50e, 4) AS p50_exact,
        |       round(1e-9 + e.p90e, 4) AS p90_exact
        |FROM sest s JOIN eest e ON s.event_type = e.event_type
        |ORDER BY s.event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
        .filter(col("value").isNotNull)
      val pv = ev
        .withColumn("a", expr("event_id & 4294967295"))
        .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
        .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
        .withColumn("pri", expr("shiftright(a, 16) ^ a"))
        .drop("a")
      val samp = quantileSample(pv, 64)
      def est(in: DataFrame, nName: String, p50: String, p90: String) = in
        .withColumn("vr", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("value"), col("event_id"))))
        .withColumn("ns", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(max(col("ns")).as(nName),
          max(when(col("vr") === expr("(ns + 1) div 2"), col("value"))).as(p50),
          max(when(col("vr") === expr("(9 * ns + 9) div 10"), col("value"))).as(p90))
      val sest = est(samp, "n_sample", "p50s", "p90s")
      val eest = est(ev, "n_rows", "p50e", "p90e")
      sest.join(eest, "event_type")
        .select(col("event_type"), col("n_rows"), col("n_sample"),
          Num.roundOut(col("p50s"), 4).as("p50_sample"),
          Num.roundOut(col("p90s"), 4).as("p90_sample"),
          Num.roundOut(col("p50e"), 4).as("p50_exact"),
          Num.roundOut(col("p90e"), 4).as("p90_exact"))
        .orderBy(col("event_type"))
    },

    // SHANNON TOKEN ENTROPY — the standard information-theoretic quality
    // metric (x32's Gini–Simpson chose a log-free formula to dodge libm;
    // this computes the real thing exactly): H = ln(n) − (Σ c·ln c)/n via
    // a FIXED-POINT ln table (k → round(ln k · 10¹²), generated once in
    // Scala, interpolated into both engines — x62's move). Because table
    // entries are integers, Σ c·lnq(c) is an exact long sum — order-
    // independent across partitions, immune to the cross-row float-
    // summation drift that bans naive Σ c·ln(c) — and H's single
    // division (plus the /ln2 for bits) is the only FP arithmetic.
    // 2^entropy_bits is the doc's effective vocabulary size; low entropy
    // at high token count flags the repetitive/templated docs x21's
    // fixed-threshold filters catch coarsely.
    //
    // Scale: one (doc, word) partial-agg pass over the persisted
    // [[Tokens]] table; the ln table is 128 rows broadcast. Counts above
    // the table bound FAIL LOUDLY on both engines (left join + explicit
    // raise_error/error() guard, ADVICE r06): a silent inner-join drop
    // would lose the same rows identically on both sides and pass the
    // oracle compare while emitting wrong entropies.
    QueryDef("x69_token_entropy",
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |                 w -> len(w) > 0)) AS word
        |  FROM documents
        |), cnt AS (
        |  SELECT doc_id, word, count(*) AS c FROM tok GROUP BY 1, 2
        |), lnt(k, q) AS (
        |  VALUES $lnqValuesSql
        |), agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(count(*) AS INT) AS n_distinct,
        |         CAST(sum(c * (CASE WHEN lnt.q IS NULL THEN
        |             CAST(error('x69: count beyond ln-table bound') AS BIGINT)
        |           ELSE lnt.q END)) AS BIGINT) AS slnc
        |  FROM cnt LEFT JOIN lnt ON lnt.k = cnt.c
        |  GROUP BY 1
        |), chk AS (
        |  SELECT a.*, CASE WHEN ln2.q IS NULL THEN
        |           CAST(error('x69: doc length beyond ln-table bound') AS BIGINT)
        |         ELSE ln2.q END AS qn
        |  FROM agg a LEFT JOIN lnt ln2 ON ln2.k = a.n
        |)
        |SELECT doc_id, n AS n_tokens, n_distinct,
        |       round(1e-9 + (qn * n - slnc) * 1.0 / (n * 1e12), 6)
        |         AS entropy_nats,
        |       round(1e-9 + (qn * n - slnc) * 1.0 / (n * 1e12)
        |             / 0.6931471805599453, 6) AS entropy_bits
        |FROM chk
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val lnq = broadcast(lnqTable.toDF("k", "q"))
      val cnt = Tokens.table(s, d)
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("c"))
      // LEFT joins + raise_error: exceeding the 128-entry ln table is a
      // loud per-row failure, never a silent both-engines row drop
      val agg = cnt.join(lnq, col("k") === col("c"), "left")
        .withColumn("lq", when(col("q").isNull, raise_error(concat(
          lit("x69: count beyond ln-table bound: "), col("c").cast("string"))))
          .otherwise(col("q")))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"),
          count(lit(1)).cast("int").as("n_distinct"),
          sum(col("c") * col("lq")).as("slnc"))
      val lnN = lnq.select(col("k").as("kn"), col("q").as("q2"))
      agg.join(lnN, col("kn") === col("n"), "left")
        .withColumn("qn", when(col("q2").isNull, raise_error(concat(
          lit("x69: doc length beyond ln-table bound: "),
          col("n").cast("string")))).otherwise(col("q2")))
        .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
          Num.roundOut((col("qn") * col("n") - col("slnc")) * 1.0
            / (col("n") * lit(1e12)), 6).as("entropy_nats"),
          Num.roundOut((col("qn") * col("n") - col("slnc")) * 1.0
            / (col("n") * lit(1e12)) / lit(0.6931471805599453), 6)
            .as("entropy_bits"))
        .orderBy(col("doc_id"))
    },

    // KMV SET-OPERATION SKETCHES (Beyer et al. SIGMOD'07; the theta-sketch
    // core of Apache DataSketches): per event_type, keep the K=64 smallest
    // deterministic-mixer hash values of the distinct users; for each type
    // pair, merge to the union's bottom-64 and estimate |A∪B| = (K−1)·2³²
    // / kth-min (exact count when the merged sketch holds everything) and
    // |A∩B| = (matches/k̂)·|A∪B|̂, where matches counts union-sketch
    // entries present in BOTH sides' sketches. Every sketch value is an
    // integer both engines reproduce bit-for-bit (x64's mixer); the two
    // estimate divisions are the only FP ops, and exact union/intersection
    // ride along for calibration.
    //
    // Scale: each sketch is ≤64 (pri, user) rows per type — mergeable
    // partial state like x64's bottom-k (whose salted two-level selection
    // is the 100 TB path for this window too); pair merging touches only
    // sketch rows (K per side), never the user sets; the exact arm is the
    // oracle's calibration, not the serving path.
    QueryDef("x79_kmv_set_ops",
      """WITH du AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |), h0 AS (
        |  SELECT event_type, user_id, user_id & 4294967295 AS a FROM du
        |), h1 AS (
        |  SELECT event_type, user_id,
        |         (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h0
        |), h2 AS (
        |  SELECT event_type, user_id,
        |         (xor(a >> 16, a) * 73244475) & 4294967295 AS a FROM h1
        |), pv AS (
        |  SELECT event_type, user_id, xor(a >> 16, a) AS pri FROM h2
        |), sk AS (
        |  SELECT event_type, user_id, pri FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY pri, user_id) AS rn
        |    FROM pv) WHERE rn <= 64
        |), ty AS (
        |  SELECT DISTINCT event_type FROM du
        |), pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM ty a JOIN ty b ON a.event_type < b.event_type
        |), contrib AS (
        |  SELECT p.ta, p.tb, s.user_id, s.pri, 1 AS fa, 0 AS fb
        |  FROM pairs p JOIN sk s ON s.event_type = p.ta
        |  UNION ALL
        |  SELECT p.ta, p.tb, s.user_id, s.pri, 0, 1
        |  FROM pairs p JOIN sk s ON s.event_type = p.tb
        |), merged AS (
        |  SELECT ta, tb, user_id, pri, max(fa) AS fa, max(fb) AS fb
        |  FROM contrib GROUP BY 1, 2, 3, 4
        |), msk AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY ta, tb
        |                                 ORDER BY pri, user_id) AS rn
        |    FROM merged) WHERE rn <= 64
        |), stats AS (
        |  SELECT ta, tb, CAST(count(*) AS BIGINT) AS ku,
        |         CAST(max(pri) AS BIGINT) AS kth,
        |         CAST(sum(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS matches
        |  FROM msk GROUP BY 1, 2
        |), sz AS (
        |  SELECT event_type, count(*) AS n FROM du GROUP BY 1
        |), inter AS (
        |  SELECT p.ta, p.tb, CAST(count(*) AS BIGINT) AS exact_inter
        |  FROM pairs p
        |  JOIN du a ON a.event_type = p.ta
        |  JOIN du b ON b.event_type = p.tb AND b.user_id = a.user_id
        |  GROUP BY 1, 2
        |)
        |SELECT s.ta AS type_a, s.tb AS type_b,
        |       CAST(za.n + zb.n - coalesce(i.exact_inter, 0) AS BIGINT)
        |         AS exact_union,
        |       CAST(coalesce(i.exact_inter, 0) AS BIGINT) AS exact_inter,
        |       s.ku, s.kth, s.matches,
        |       round(1e-9 + CASE WHEN s.ku < 64 THEN s.ku * 1.0
        |             ELSE 63.0 * 4294967296 / s.kth END, 4) AS est_union,
        |       round(1e-9 + s.matches * (CASE WHEN s.ku < 64 THEN s.ku * 1.0
        |             ELSE 63.0 * 4294967296 / s.kth END) / s.ku, 4)
        |         AS est_inter
        |FROM stats s
        |JOIN sz za ON za.event_type = s.ta
        |JOIN sz zb ON zb.event_type = s.tb
        |LEFT JOIN inter i ON i.ta = s.ta AND i.tb = s.tb
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val K = 64
      val du = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .localCheckpoint()
      val pv = du
        .withColumn("a", expr("user_id & 4294967295"))
        .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
        .withColumn("a", expr("(shiftright(a, 16) ^ a) * 73244475 & 4294967295"))
        .withColumn("pri", expr("shiftright(a, 16) ^ a"))
        .drop("a")
      val sk = pv.withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("pri"), col("user_id"))))
        .filter(col("rn") <= K)
        .select(col("event_type"), col("user_id"), col("pri"))
      val ty = du.select(col("event_type")).distinct()
      val pairs = ty.as("a").join(ty.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      val contrib = pairs
        .join(sk.select(col("event_type").as("ta"), col("user_id"), col("pri")), "ta")
        .select(col("ta"), col("tb"), col("user_id"), col("pri"),
          lit(1).as("fa"), lit(0).as("fb"))
        .unionByName(pairs
          .join(sk.select(col("event_type").as("tb"), col("user_id"), col("pri")), "tb")
          .select(col("ta"), col("tb"), col("user_id"), col("pri"),
            lit(0).as("fa"), lit(1).as("fb")))
      val merged = contrib
        .groupBy(col("ta"), col("tb"), col("user_id"), col("pri"))
        .agg(max(col("fa")).as("fa"), max(col("fb")).as("fb"))
      val msk = merged.withColumn("rn", row_number().over(
          Window.partitionBy(col("ta"), col("tb"))
            .orderBy(col("pri"), col("user_id"))))
        .filter(col("rn") <= K)
      val stats = msk.groupBy(col("ta"), col("tb")).agg(
        count(lit(1)).as("ku"),
        max(col("pri")).as("kth"),
        sum(when(col("fa") === 1 && col("fb") === 1, 1).otherwise(0))
          .as("matches"))
      val sz = du.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(du.select(col("event_type").as("ta"), col("user_id")), "ta")
        .join(du.select(col("event_type").as("tb"), col("user_id")),
          Seq("tb", "user_id"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("exact_inter"))
      val estU = when(col("ku") < K, col("ku") * 1.0)
        .otherwise(lit(63.0) * 4294967296L / col("kth"))
      stats
        .join(broadcast(sz.select(col("event_type").as("ta"), col("n").as("na"))), "ta")
        .join(broadcast(sz.select(col("event_type").as("tb"), col("n").as("nb"))), "tb")
        .join(inter, Seq("ta", "tb"), "left")
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          (col("na") + col("nb") - coalesce(col("exact_inter"), lit(0L)))
            .as("exact_union"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
          col("ku"), col("kth"), col("matches"),
          Num.roundOut(estU, 4).as("est_union"),
          Num.roundOut(col("matches") * estU / col("ku"), 4).as("est_inter"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // GOOD–TURING FREQUENCY SMOOTHING (Gale & Sampson 1995) — the classic
    // LM count-adjustment step, over word BIGRAMS (the paper's setting,
    // and the event space rare enough to have real singleton mass): from
    // the corpus bigram counts, build the frequency-of-frequencies table
    // N_c and emit the adjusted count c* = (c+1)·N_{c+1}/N_c and smoothed
    // probability mass per bigram (parts-per-million) for every c where
    // N_{c+1} exists. All inputs are exact integers — (c+1)·N_{c+1} is an
    // exact long product and the single division per output row is the
    // only FP op, evaluated in the same order on both engines (no libm,
    // x69's contract). Rows where N_{c+1} = 0 are excluded on both sides
    // (GT is undefined there; emitting NULL doubles would also diverge in
    // the driver compare: parquet null → pandas NaN vs DuckDB None).
    //
    // Scale: one per-row gram pass + one partial-agg for the bigram
    // counts; N_c is count-of-counts sized (tens of rows at any corpus
    // size — count values collapse), the total-gram scalar is broadcast,
    // and everything past the first aggregate is driver-tiny.
    QueryDef("x76_good_turing",
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(range(len(ws) - 1),
        |                i -> ws[i+1] || '_' || ws[i+2])) AS gram
        |  FROM t WHERE len(ws) >= 2
        |), cnt AS (
        |  SELECT gram, count(*) AS c FROM g GROUP BY 1
        |), ff AS (
        |  SELECT c, count(*) AS n_c FROM cnt GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(c * n_c) AS BIGINT) AS t FROM ff
        |)
        |SELECT a.c, CAST(a.n_c AS BIGINT) AS n_c,
        |       CAST(b.n_c AS BIGINT) AS n_next,
        |       round(1e-9 + (a.c + 1) * b.n_c * 1.0 / a.n_c, 6) AS c_star,
        |       round(1e-9 + (a.c + 1) * b.n_c * 1000000.0 / (a.n_c * t), 6)
        |         AS p_gt_ppm
        |FROM ff a JOIN ff b ON b.c = a.c + 1, tot
        |ORDER BY a.c LIMIT 40""".stripMargin) { (s, d) =>
      val cnt = Tables.documents(s, d)
        .filter(size(Text.tokens(col("text"))) >= 2)
        .select(explode(Text.rawShingles(col("text"), 2)).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("c"))
      val ff = cnt.groupBy(col("c")).agg(count(lit(1)).as("n_c"))
      val tot = ff.agg(sum(col("c") * col("n_c")).as("t"))
      val nxt = ff.select((col("c") - 1).as("c"), col("n_c").as("n_next"))
      ff.join(nxt, "c")
        .crossJoin(broadcast(tot))
        .select(col("c"), col("n_c"), col("n_next"),
          Num.roundOut((col("c") + 1) * col("n_next") * 1.0 / col("n_c"), 6)
            .as("c_star"),
          Num.roundOut((col("c") + 1) * col("n_next") * 1000000.0
            / (col("n_c") * col("t")), 6).as("p_gt_ppm"))
        .orderBy(col("c")).limit(40)
    },

    // ZIPF RANK-FREQUENCY SLOPE per source — the standard corpus-health
    // diagnostic (natural text sits near slope −1; templated/boilerplate
    // sources flatten, spam steepens): OLS of ln(count) on ln(rank) over
    // each source's top-32 words. The log lives in integer space via
    // [[ln6Table]]'s mantissa decomposition (x69's fixed-point ln
    // GENERALIZED to unbounded counts: n = m·2^s, ln6(n) = table(m) +
    // s·ln2), so every OLS moment is an exact long sum — order-independent
    // across partitions — and the slope/intercept/r² divisions at the end
    // are the only FP ops, written in the identical order on both engines.
    //
    // Scale: per-(doc, word) partial agg → one doc_id-keyed enrich join
    // with the doc→source map → per-(source, word) agg; the top-32 window
    // sorts vocabulary only within source; floor-log2 and both ln lookups
    // are ≤128-row broadcasts; the OLS state is 6 longs per source. No
    // corpus-sized state survives the second aggregate.
    QueryDef("x80_zipf_slope",
      s"""WITH ds AS (
        |  SELECT doc_id, source FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |                 w -> len(w) > 0)) AS word
        |  FROM documents
        |), pd AS (
        |  SELECT doc_id, word, count(*) AS cd FROM tok GROUP BY 1, 2
        |), cnt AS (
        |  SELECT ds.source, pd.word, CAST(sum(cd) AS BIGINT) AS c
        |  FROM pd JOIN ds ON pd.doc_id = ds.doc_id GROUP BY 1, 2
        |), top AS (
        |  SELECT * FROM (
        |    SELECT source, word, c,
        |           row_number() OVER (PARTITION BY source
        |                              ORDER BY c DESC, word) AS rn
        |    FROM cnt) WHERE rn <= 32
        |), p2(k, v) AS (
        |  VALUES $pow2ValuesSql
        |), fl AS (
        |  SELECT source, word, rn, c, max(k) AS kk
        |  FROM top JOIN p2 ON p2.v <= top.c GROUP BY 1, 2, 3, 4
        |), lnt(lk, lq) AS (
        |  VALUES $ln6ValuesSql
        |), yv AS (
        |  SELECT source, rn,
        |         CAST(lq AS BIGINT) + greatest(kk - 6, 0) * $Ln2Fp6 AS y
        |  FROM (SELECT source, rn, kk, c >> greatest(kk - 6, 0) AS m FROM fl) f
        |  JOIN lnt ON lnt.lk = f.m
        |), xy AS (
        |  SELECT source, CAST(l2.lq AS BIGINT) AS x, y
        |  FROM yv JOIN lnt l2 ON l2.lk = yv.rn
        |), ols AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS r,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM xy GROUP BY 1
        |), fin AS (
        |  SELECT source, r, sx, sy,
        |         r * sxy - sx * sy AS num,
        |         r * sxx - sx * sx AS den,
        |         r * syy - sy * sy AS dyy
        |  FROM ols
        |)
        |SELECT source, CAST(r AS INT) AS n_top,
        |       round(1e-9 + num * 1.0 / den, 6) AS slope,
        |       round(1e-9 + (sy * 1.0 / r - (num * 1.0 / den) * (sx * 1.0 / r))
        |             / 1000000.0, 6) AS intercept_nats,
        |       round(1e-9 + (num * 1.0 * num) / ((den * 1.0) * dyy), 6) AS r2
        |FROM fin ORDER BY source""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val pd = Tokens.table(s, d)
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("cd"))
      val cnt = pd.join(ds, "doc_id")
        .groupBy(col("source"), col("word"))
        .agg(sum(col("cd")).as("c"))
      val top = cnt.withColumn("rn", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("c").desc, col("word"))))
        .filter(col("rn") <= 32)
      val p2 = broadcast(pow2Table.toDF("k", "v"))
      val fl = top.join(p2, col("v") <= col("c"))
        .groupBy(col("source"), col("word"), col("rn"), col("c"))
        .agg(max(col("k")).as("kk"))
      val lnt = broadcast(ln6Table.toDF("lk", "lq"))
      // m = c >> max(kk−6, 0) lands in [64, 127] for c ≥ 128 and equals c
      // below — always inside the 128-entry table, so the inner join is
      // total by construction (unlike x69's data-dependent counts).
      val yv = fl
        .withColumn("sh", greatest(col("kk") - 6, lit(0)))
        .withColumn("m", expr("shiftright(c, sh)"))
        .join(lnt, col("lk") === col("m"))
        .select(col("source"), col("rn"),
          (col("lq") + col("sh") * lit(Ln2Fp6)).as("y"))
      val xy = yv.join(lnt.select(col("lk").as("rk"), col("lq").as("x")),
        col("rk") === col("rn"))
      val fin = xy.groupBy(col("source")).agg(
          count(lit(1)).as("r"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("num", col("r") * col("sxy") - col("sx") * col("sy"))
        .withColumn("den", col("r") * col("sxx") - col("sx") * col("sx"))
        .withColumn("dyy", col("r") * col("syy") - col("sy") * col("sy"))
      fin.select(col("source"), col("r").cast("int").as("n_top"),
          Num.roundOut(col("num") * 1.0 / col("den"), 6).as("slope"),
          Num.roundOut((col("sy") * 1.0 / col("r")
            - (col("num") * 1.0 / col("den")) * (col("sx") * 1.0 / col("r")))
            / 1000000.0, 6).as("intercept_nats"),
          Num.roundOut((col("num") * 1.0 * col("num"))
            / ((col("den") * 1.0) * col("dyy")), 6).as("r2"))
        .orderBy(col("source"))
    },

    // HASHED LINEAR QUALITY SCORER — the fastText-style model-based
    // filter a curation pipeline runs after the heuristic battery (x08):
    // each token hashes into a 512-bin feature space (hashing trick,
    // Weinberger et al. ICML'09), each bin carries a signed integer
    // weight, a document's score is the mean bin weight over its token
    // stream. The weight table here is DERIVED deterministically from the
    // bin id through x62's avalanche mixer (mixed % 2001 − 1000 ∈
    // [−1000, 1000]) — in production it comes from a trained model file;
    // the PLUMBING (vocab-sized hash pass, broadcast weight probe,
    // map-side fold) is what this operator pins, and a real weight vector
    // drops in as a parquet read without touching the plan. Scoring is
    // ALL-INTEGER (Σ of per-token weights) until the single final mean
    // division — bit-identical across engines; the keep decision
    // (score_sum > 0) never touches a float.
    //
    // Scale: the portable char hash runs once per DISTINCT word (vocab-
    // sized, the x39 lesson); the weight probe is a broadcast join against
    // a 512-entry derived table folded map-side into per-doc partials —
    // the fact stream never shuffles on anything but doc_id partials.
    // At 100 TB this is a pure scan-side scoring pass: no state, no
    // self-join, embarrassingly parallel.
    QueryDef("x93_hashed_linear_score",
      s"""WITH $hashedScoreCteSql
        |SELECT doc_id, n_tokens, score_sum,
        |       round(1e-9 + score_sum * 1.0 / n_tokens, 4) AS score_mean,
        |       score_sum > 0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
      hashedScoreTable(s, d)
        .select(col("doc_id"), col("n_tokens"), col("score_sum"),
          Num.roundOut(col("score_sum") * 1.0 / col("n_tokens"), 4)
            .as("score_mean"),
          (col("score_sum") > 0).as("keep"))
        .orderBy(col("doc_id"))
    },

    // SCORE CALIBRATION TABLE — the reliability diagram for x93's
    // scorer against the x08 quality label (positive = composite
    // quality ≥ 0.63, a policy threshold at the corpus median): docs
    // bucket into FIXED score bins (floor(mean/100) — pure map-side
    // arithmetic, no rank window, so binning scales like a filter),
    // each bin reporting its positive rate and its exact aggregate
    // score (Σ score_sum / Σ tokens — integer sums, one division). A
    // predictive scorer shows pos_rate rising with bin; x93's
    // hash-random placeholder weights show the flat curve this table
    // exists to expose — swap the weight table for a trained one and
    // THIS query is the eval gate that proves the swap helped.
    //
    // Scale: two doc-keyed derived tables (score, label) join on id;
    // everything after is a bins-sized aggregate with map-side combine.
    QueryDef("x117_score_calibration",
      s"""WITH $hashedScoreCteSql, $qualityMSql, lab AS (
        |  SELECT doc_id, $qualitySql AS quality
        |  FROM m WHERE n_tokens > 0
        |), j AS (
        |  SELECT sc.doc_id, sc.score_sum AS ss, sc.n_tokens AS nt,
        |         CAST(floor((sc.score_sum * 1.0 / sc.n_tokens) / 100)
        |              AS BIGINT) AS bin,
        |         CASE WHEN lab.quality >= 0.63 THEN 1 ELSE 0 END AS pos
        |  FROM sc JOIN lab USING (doc_id)
        |)
        |SELECT bin, CAST(bin * 100 AS BIGINT) AS bin_lo,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(pos) AS BIGINT) AS n_pos,
        |       round(1e-9 + sum(pos) * 1.0 / count(*), 4) AS pos_rate,
        |       round(1e-9 + sum(ss) * 1.0 / sum(nt), 4) AS bin_score
        |FROM j GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
      val sc = hashedScoreTable(s, d)
        .select(col("doc_id"), col("score_sum").as("ss"),
          col("n_tokens").as("nt"))
      val lab = Tables.documents(s, d)
        .filter(size(Text.tokens(col("text"))) > 0)
        .select(col("doc_id"), qualityCol.as("quality"))
      sc.join(lab, "doc_id")
        .select(col("ss"), col("nt"),
          floor((col("ss") * 1.0 / col("nt")) / 100).cast("long").as("bin"),
          when(col("quality") >= 0.63, 1L).otherwise(0L).as("pos"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
          sum(col("ss")).as("sum_ss"), sum(col("nt")).as("sum_nt"))
        .select(col("bin"), (col("bin") * 100).as("bin_lo"), col("n_docs"),
          col("n_pos"),
          Num.roundOut(col("n_pos") * 1.0 / col("n_docs"), 4).as("pos_rate"),
          Num.roundOut(col("sum_ss") * 1.0 / col("sum_nt"), 4).as("bin_score"))
        .orderBy(col("bin"))
    },

    // ISOTONIC (PAV) CALIBRATION — the monotone fit x117's reliability
    // table feeds when the scorer goes to SERVING: the isotonic
    // regression of pos_rate on score bin, i.e. the least-squares
    // monotone step function (Zadrozny/Elkan calibration). Computed by
    // the minimax characterization iso(i) = max_{j≤i} min_{k≥i}
    // mean(pos over bins j..k) instead of the sequential
    // pool-adjacent-violators stack: the bin table is BOUNDED (fixed
    // score bins, ~21 at any corpus size), so the (j,k) interval means
    // and the (i,j,k) max-min collapse are bins³ ≈ 10⁴ rows of pure
    // relational algebra — no driver loop, no iteration, no window.
    // Every interval mean is one IEEE division of exact integer sums,
    // bit-identical cross-engine; max/min over identical doubles are
    // identical.
    //
    // Scale: one corpus pass builds the bin table (x117's map-side
    // binning); everything after is bins-sized. At 100 TB the ONLY
    // data-sized stage is the score+label join x117 already pays.
    QueryDef("x174_isotonic_pav", TextAnalysis.x174OracleSql) { (s, d) =>
      val sc = hashedScoreTable(s, d)
      val lab = Tables.documents(s, d)
        .filter(size(Text.tokens(col("text"))) > 0)
        .select(col("doc_id"), qualityCol.as("quality"))
      val b = sc.join(lab, "doc_id")
        .select(
          floor((col("score_sum") * 1.0 / col("n_tokens")) / 100)
            .cast("long").as("bin"),
          when(col("quality") >= 0.63, 1L).otherwise(0L).as("pos"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
      pavReport(b)
    },

    // DETERMINISTIC WEIGHTED SAMPLE by PRIORITY (Duffield/Lund/Thorup
    // priority sampling): each document draws priority w/u — weight
    // n_chars over a content-keyed "uniform" u = (fp+1)/(M+1) from the
    // persisted fingerprint — and the sample is the top-20 priorities.
    // This is how an eval slice gets drawn from a weighted corpus with
    // NO RNG state: re-ingesting the same corpus reproduces the same
    // sample bit-for-bit (x22's determinism contract applied to
    // sampling), heavier documents are proportionally likelier, and the
    // priority is ONE IEEE division of exact integers — bit-identical
    // cross-engine.
    //
    // Scale: priorities are per-row column math over the fingerprint
    // table; the top-20 is TakeOrderedAndProject (per-partition heaps,
    // k rows to the driver) — no global sort, no shuffle of the corpus.
    QueryDef("x97_priority_sample", TextAnalysis.x97OracleSql) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .join(fingerprintTable(s, d), "doc_id")
        .select(col("doc_id"), col("source"), col("n_chars"),
          Num.roundOut(
            col("n_chars") * 1000000008.0 / (col("fp") + 1), 4).as("pri"))
        .orderBy(col("pri").desc, col("doc_id"))
        .limit(20)
    },

    // NORMALIZATION DEDUP GAIN — how many extra duplicates canonical
    // text equality finds over raw equality, per source: lowercase,
    // strip non-alphanumerics, collapse runs of spaces, trim (the CCNet/
    // near-dup-prep canonicalization), then compare distinct-digest
    // counts under both keys. The gain column is the evidence a pipeline
    // needs before switching its dedup key — raw-equality dedup (x01)
    // silently misses trivially-reformatted copies.
    //
    // Scale: two digests per row computed map-side (the normalization
    // chain is codegen'd regexp/case ops); the per-source rollup
    // aggregates APPROX-distinct-sized state… no — EXACT distinct per
    // source here, which shuffles (source, digest) pairs once; at 100 TB
    // the digests feed x62's HLL per source instead and the report keeps
    // its shape (the x11→x12 exact→sketch swap).
    QueryDef("x98_normalization_gain",
      """WITH n AS (
        |  SELECT doc_id, source, md5(text) AS raw_h,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_h
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT raw_h) AS BIGINT) AS distinct_raw,
        |       CAST(count(DISTINCT norm_h) AS BIGINT) AS distinct_norm,
        |       CAST(count(DISTINCT raw_h) - count(DISTINCT norm_h) AS BIGINT)
        |         AS extra_dups,
        |       round(1e-9 + (count(DISTINCT raw_h) - count(DISTINCT norm_h))
        |             * 1.0 / count(*), 4) AS gain_frac
        |FROM n GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val n = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), md5(col("text")).as("raw_h"),
          md5(trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", ""), " +", " "))).as("norm_h"))
      n.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("raw_h")).as("distinct_raw"),
          countDistinct(col("norm_h")).as("distinct_norm"))
        .select(col("source"), col("n_docs"), col("distinct_raw"),
          col("distinct_norm"),
          (col("distinct_raw") - col("distinct_norm")).as("extra_dups"),
          Num.roundOut((col("distinct_raw") - col("distinct_norm")) * 1.0
            / col("n_docs"), 4).as("gain_frac"))
        .orderBy(col("source"))
    },

    // CLUSTERING AGREEMENT (Rand / Adjusted Rand) between the RAW-
    // equality dedup clustering and the CANONICAL-equality clustering —
    // the quantitative answer to x98's "how different are the two dedup
    // keys" that pair-counts instead of counting groups: RI = fraction
    // of doc pairs the two clusterings treat identically, ARI the
    // chance-corrected form (Hubert–Arabie). Everything reduces to
    // three pair-sums Σ C(k,2) over (raw_h × norm_h) cells, raw_h
    // groups, and norm_h groups — exact integer aggregates; the only
    // floats are the final two divisions (expected-index terms), both
    // guarded: a degenerate corpus where both clusterings are all
    // singletons (max = expected) reports NULL ARI by design, not by
    // accident (the x142 guarded-division rule). Because raw equality
    // REFINES canonical equality, Σ_cells == Σ_raw identically — pinned
    // in Round9Spec as the algebraic cross-check.
    //
    // Scale: three hash-keyed aggregates over one corpus pass each
    // (cells/rows/cols), every post-aggregate table collapsing to one
    // row map-side. Pair counts k·(k−1)/2 stay in int64 to ~4·10⁹ docs
    // per cell; past that the sums go DOUBLE (the x142 overflow note).
    QueryDef("x176_dedup_ari",
      """WITH n AS (
        |  SELECT doc_id, md5(text) AS raw_h,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_h
        |  FROM documents
        |), cells AS (
        |  SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT) AS spair,
        |         CAST(sum(k) AS BIGINT) AS nn
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS k FROM n
        |        GROUP BY raw_h, norm_h)
        |), ra AS (
        |  SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT) AS sa
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS k FROM n
        |        GROUP BY raw_h)
        |), rb AS (
        |  SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT) AS sb
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS k FROM n
        |        GROUP BY norm_h)
        |), f AS (
        |  SELECT nn, spair, sa, sb, nn * (nn - 1) // 2 AS tot,
        |         sa * 1.0 * sb / (nn * (nn - 1) // 2) AS expd,
        |         (sa + sb) / 2.0 AS mx
        |  FROM cells, ra, rb
        |)
        |SELECT nn AS n_docs, spair AS pairs_cells, sa AS pairs_raw,
        |       sb AS pairs_norm,
        |       round(1e-9 + (tot + 2 * spair - sa - sb) * 1.0 / tot, 6)
        |         AS rand_index,
        |       CASE WHEN mx = expd THEN NULL
        |            ELSE round(1e-9 + (spair - expd) / (mx - expd), 6)
        |       END AS ari
        |FROM f""".stripMargin) { (s, d) =>
      val n = Tables.documents(s, d)
        .select(md5(col("text")).as("raw_h"),
          md5(trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", ""), " +", " "))).as("norm_h"))
        .localCheckpoint() // one corpus digest pass; three rollups read it
      def pairSum(df: org.apache.spark.sql.DataFrame, cs: Seq[String],
          out: String) =
        df.groupBy(cs.map(col): _*).agg(count(lit(1)).as("k"))
          .agg(sum(expr("k * (k - 1) div 2")).as(out),
            sum(col("k")).as(out + "_n"))
      val cells = pairSum(n, Seq("raw_h", "norm_h"), "spair")
        .withColumnRenamed("spair_n", "nn")
      val ra = pairSum(n, Seq("raw_h"), "sa").drop("sa_n")
      val rb = pairSum(n, Seq("norm_h"), "sb").drop("sb_n")
      cells.crossJoin(ra).crossJoin(rb)
        .select(col("nn"), col("spair"), col("sa"), col("sb"),
          expr("nn * (nn - 1) div 2").as("tot"),
          (col("sa") * 1.0 * col("sb")
            / expr("nn * (nn - 1) div 2")).as("expd"),
          ((col("sa") + col("sb")) / 2.0).as("mx"))
        .select(col("nn").as("n_docs"), col("spair").as("pairs_cells"),
          col("sa").as("pairs_raw"), col("sb").as("pairs_norm"),
          Num.roundOut((col("tot") + lit(2) * col("spair") - col("sa")
            - col("sb")) * 1.0 / col("tot"), 6).as("rand_index"),
          when(col("mx") === col("expd"), lit(null).cast("double"))
            .otherwise(Num.roundOut((col("spair") - col("expd"))
              / (col("mx") - col("expd")), 6)).as("ari"))
    },

    // DETERMINISTIC POISSON BOOTSTRAP — a 94%-ish CI for each source's
    // mean document length, with NO RNG: every (doc, resample) pair
    // draws its multiplicity from the content fingerprint through the
    // x62 mixer, thresholded to the Poisson(1) pmf (368/368/184/61/15/4
    // per mille for counts 0..5+). The Poisson bootstrap (Chamandy et
    // al., Google) is THE resampling scheme that works on a stream — no
    // global n needed per resample, each row decides its own counts —
    // and making the uniform content-keyed makes the whole CI
    // REPRODUCIBLE: same corpus, same interval, bit-for-bit (x97's
    // determinism contract applied to uncertainty quantification).
    // B=32 resample means per source; the interval is rank-selected
    // (2nd..31st, x94's rank rule — reported bounds are actual resample
    // means, no interpolation).
    //
    // Scale: ONE corpus pass fans each row out ×32 (a constant), the
    // (source, b) partial agg map-side combines to sources×32 rows, and
    // the rank windows run on 32-row groups — uncertainty for free at
    // any corpus size, where a classical bootstrap would re-scan B
    // times.
    QueryDef("x100_bootstrap_ci",
      s"""WITH f AS (
        |  SELECT doc_id, source, n_chars, $fingerprintSql AS fp
        |  FROM documents
        |), rb AS (
        |  SELECT source, n_chars, b,
        |         xor(a2 >> 16, a2) % 1000 AS t
        |  FROM (
        |    SELECT source, n_chars, b,
        |           (xor(a1 >> 16, a1) * 73244475) & 4294967295 AS a2
        |    FROM (
        |      SELECT source, n_chars, b,
        |             (xor(a0 >> 16, a0) * 73244475) & 4294967295 AS a1
        |      FROM (
        |        SELECT source, n_chars, b,
        |               (fp + b * 40503) & 4294967295 AS a0
        |        FROM f, (SELECT unnest(range(32)) AS b)
        |      )
        |    )
        |  )
        |), c AS (
        |  SELECT source, b, n_chars,
        |         CASE WHEN t < 368 THEN 0 WHEN t < 736 THEN 1
        |              WHEN t < 920 THEN 2 WHEN t < 981 THEN 3
        |              WHEN t < 996 THEN 4 ELSE 5 END AS c
        |  FROM rb
        |), mb AS (
        |  SELECT source, CAST(b AS INT) AS b,
        |         CAST(sum(c * n_chars) AS BIGINT) * 1.0
        |           / CAST(sum(c) AS BIGINT) AS m
        |  FROM c GROUP BY 1, 2 HAVING sum(c) > 0
        |), rk AS (
        |  SELECT source, m,
        |         row_number() OVER (PARTITION BY source ORDER BY m, b) AS rn,
        |         count(*) OVER (PARTITION BY source) AS nb
        |  FROM mb
        |), ci AS (
        |  SELECT source,
        |         min(CASE WHEN rn = 2 THEN m END) AS lo,
        |         min(CASE WHEN rn = nb - 1 THEN m END) AS hi
        |  FROM rk GROUP BY source
        |), base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) * 1.0 / count(*) AS mean_chars
        |  FROM documents GROUP BY source
        |)
        |SELECT base.source, base.n_docs,
        |       round(1e-9 + base.mean_chars, 4) AS mean_chars,
        |       round(1e-9 + ci.lo, 4) AS ci_lo,
        |       round(1e-9 + ci.hi, 4) AS ci_hi
        |FROM base JOIN ci USING (source) ORDER BY source""".stripMargin) {
      (s, d) =>
      val f = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .join(fingerprintTable(s, d), "doc_id")
      val rb = f
        .withColumn("b", explode(sequence(lit(0), lit(31))))
        .withColumn("a0", expr("(fp + b * 40503) & 4294967295"))
        .withColumn("a1", expr("(shiftright(a0, 16) ^ a0) * 73244475 & 4294967295"))
        .withColumn("a2", expr("(shiftright(a1, 16) ^ a1) * 73244475 & 4294967295"))
        .withColumn("t", expr("(shiftright(a2, 16) ^ a2) % 1000"))
      val c = rb.withColumn("c",
        when(col("t") < 368, 0L).when(col("t") < 736, 1L)
          .when(col("t") < 920, 2L).when(col("t") < 981, 3L)
          .when(col("t") < 996, 4L).otherwise(5L))
      val mb = c.groupBy(col("source"), col("b"))
        .agg(sum(col("c") * col("n_chars")).as("num"), sum(col("c")).as("den"))
        .filter(col("den") > 0)
        .select(col("source"), col("b").cast("int").as("b"),
          (col("num") * 1.0 / col("den")).as("m"))
      val w = Window.partitionBy(col("source"))
      val rk = mb
        .withColumn("rn", row_number().over(w.orderBy(col("m"), col("b"))))
        .withColumn("nb", count(lit(1)).over(w))
      val ci = rk.groupBy(col("source")).agg(
        min(when(col("rn") === 2, col("m"))).as("lo"),
        min(when(col("rn") === col("nb") - 1, col("m"))).as("hi"))
      val base = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")) * 1.0 / count(lit(1))).as("mean_chars"))
      base.join(ci, "source")
        .select(col("source"), col("n_docs"),
          Num.roundOut(col("mean_chars"), 4).as("mean_chars"),
          Num.roundOut(col("lo"), 4).as("ci_lo"),
          Num.roundOut(col("hi"), 4).as("ci_hi"))
        .orderBy(col("source"))
    },

    // SOURCE VOCABULARY-OVERLAP MATRIX — pairwise Jaccard between each
    // source's distinct word set, the redundancy map a mixing policy
    // reads before weighting sources (two crawls with 0.9 vocabulary
    // overlap are near-substitutes; x81's temperature mix treats them as
    // independent unless this table says otherwise). Pairs come from the
    // word→sources inverted index (x04's shape one level up): only
    // sources SHARING a word ever pair, |∩| falls out of the equi-join
    // count, and |∪| = |A|+|B|−|∩| from the per-source vocab sizes — so
    // the Jaccard is exact-integer counts and ONE division.
    //
    // Scale: the distinct (source, word) projection is vocab-bounded per
    // source (not doc-bounded); the pair stage's output is capped at
    // (sources choose 2) rows per word with sources in the tens, and the
    // final matrix is sources²-sized. The persisted token table feeds
    // the projection, so warm runs never re-tokenize.
    QueryDef("x124_source_overlap",
      """WITH ws AS (
        |  SELECT DISTINCT source, word FROM (
        |    SELECT source,
        |           unnest(list_filter(string_split(text, ' '),
        |                              w -> len(w) > 0)) AS word
        |    FROM documents)
        |), sz AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS v FROM ws GROUP BY 1
        |), p AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         CAST(count(*) AS BIGINT) AS i
        |  FROM ws a JOIN ws b ON a.word = b.word AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT src_a, src_b, i AS n_shared,
        |       round(1e-9 + i * 1.0 / (sa.v + sb.v - i), 6) AS jaccard
        |FROM p JOIN sz sa ON sa.source = p.src_a
        |       JOIN sz sb ON sb.source = p.src_b
        |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
      x124Impl(s, d)
    },

    // KOLMOGOROV–SMIRNOV DRIFT per source — the distribution-shift
    // monitor a mixing policy runs on every ingest batch: for each
    // source, the two-sample KS statistic between its document-length
    // distribution and the pooled corpus (sup-norm distance between the
    // empirical CDFs). The statistic stays in INTEGERS by cross-scaling:
    // dev(v) = |cum_src(v)·N − cum_all(v)·N_src| on the shared value
    // grid, D_scaled = max_v dev — no division until the single final
    // ks = D_scaled/(N·N_src) — so argmax and flagging are bit-exact
    // cross-engine; at_val reports where the CDFs diverge most (the
    // length band to inspect).
    //
    // Scale: per-(source, length) counts combine map-side; the CDF grid
    // is sources × distinct-lengths (bounded by the length domain, not
    // the corpus), windows run per source over that grid, and the
    // report is sources-sized.
    QueryDef("x126_ks_distance",
      """WITH vals AS (SELECT DISTINCT n_chars AS v FROM documents),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |cnts AS (
        |  SELECT source, n_chars AS v, count(*) AS c
        |  FROM documents GROUP BY 1, 2
        |), grid AS (
        |  SELECT s.source, vals.v, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN vals
        |  LEFT JOIN cnts c ON c.source = s.source AND c.v = vals.v
        |), cum AS (
        |  SELECT source, v,
        |         CAST(sum(c) OVER (PARTITION BY source ORDER BY v)
        |              AS BIGINT) AS cs
        |  FROM grid
        |), gcnt AS (
        |  SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1
        |), gcum AS (
        |  SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS gc
        |  FROM gcnt
        |), ns AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_src
        |  FROM documents GROUP BY 1
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
        |dd AS (
        |  SELECT cum.source, cum.v,
        |         abs(cum.cs * nn.n_total - gcum.gc * ns.n_src) AS dev
        |  FROM cum JOIN gcum USING (v)
        |       JOIN ns ON ns.source = cum.source, nn
        |), dm AS (
        |  SELECT source, CAST(max(dev) AS BIGINT) AS d_scaled
        |  FROM dd GROUP BY 1
        |)
        |SELECT dm.source, ns.n_src AS n_docs, dm.d_scaled,
        |       round(1e-9 + dm.d_scaled * 1.0 / (nn.n_total * ns.n_src), 6)
        |         AS ks,
        |       CAST(min(dd.v) AS BIGINT) AS at_val
        |FROM dm JOIN dd ON dd.source = dm.source AND dd.dev = dm.d_scaled
        |        JOIN ns ON ns.source = dm.source, nn
        |GROUP BY dm.source, ns.n_src, dm.d_scaled, nn.n_total
        |ORDER BY dm.source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
      val cnts = docs.groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val vals = docs.select(col("n_chars").as("v")).distinct()
      val srcs = docs.select(col("source")).distinct()
      val grid = srcs.crossJoin(vals)
        .join(cnts, Seq("source", "v"), "left")
        .select(col("source"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      val cum = grid.withColumn("cs", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val gcum = docs.groupBy(col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .withColumn("gc", sum(col("c")).over(
          Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("v"), col("gc"))
      val ns = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      val nn = docs.agg(count(lit(1)).as("n_total"))
      val dd = cum.join(gcum, "v")
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(nn))
        .withColumn("dev",
          abs(col("cs") * col("n_total") - col("gc") * col("n_src")))
        .localCheckpoint() // argmax join reads it twice
      val dm = dd.groupBy(col("source")).agg(max(col("dev")).as("d_scaled"))
      dm.join(dd.select(col("source"), col("v"), col("dev"), col("n_src"),
          col("n_total")),
          Seq("source"))
        .filter(col("dev") === col("d_scaled"))
        .groupBy(col("source"), col("n_src"), col("d_scaled"), col("n_total"))
        .agg(min(col("v")).as("at_val"))
        .select(col("source"), col("n_src").as("n_docs"), col("d_scaled"),
          Num.roundOut(col("d_scaled") * 1.0 / (col("n_total") * col("n_src")), 6)
            .as("ks"),
          col("at_val"))
        .orderBy(col("source"))
    },

    // QUANTILE NORMALIZATION across sources — the score-harmonization
    // step a mixing policy needs when per-source scores aren't
    // comparable (x126 DETECTS the distribution shift; this REMOVES it):
    // each document's score (n_chars plays the score) maps to the pooled
    // corpus value at the same quantile — rank within source, then read
    // the global order statistic at the proportional position. All index
    // math is INTEGER (gpos = (rk−1)(N−1) div (n_src−1), deciles by
    // integer division, milli-unit averages by integer division), so
    // both engines agree bit-for-bit. The report is per (source, decile)
    // raw-vs-normalized averages: after normalization the per-decile
    // norm column is nearly source-invariant — the harmonization
    // evidence.
    //
    // Scale: the per-source rank is an ordinary partitioned window; the
    // GLOBAL rank uses x118's two-pass distributed trick (value-range
    // buckets are order-preserving for a score-ordered sort key +
    // broadcast bucket offsets — no single-partition sort); the order
    // statistic lookup is an equi-join on rank, and the report is
    // (sources × 10)-sized.
    QueryDef("x130_quantile_norm",
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(row_number() OVER (PARTITION BY source
        |                                 ORDER BY n_chars, doc_id)
        |              AS BIGINT) AS rk
        |  FROM documents
        |), ns AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_src
        |  FROM documents GROUP BY 1
        |), g AS (
        |  SELECT n_chars AS v,
        |         CAST(row_number() OVER (ORDER BY n_chars, doc_id)
        |              AS BIGINT) AS grank
        |  FROM documents
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |m AS (
        |  SELECT r.source, r.n_chars, r.rk, ns.n_src,
        |         ((r.rk - 1) * (nn.n - 1)) // greatest(ns.n_src - 1, 1) + 1
        |           AS gpos
        |  FROM r JOIN ns USING (source), nn
        |), j AS (
        |  SELECT m.source, m.n_chars AS raw, g.v AS norm,
        |         ((m.rk - 1) * 10) // m.n_src AS decile
        |  FROM m JOIN g ON g.grank = m.gpos
        |)
        |SELECT source, CAST(decile AS INT) AS decile, count(*) AS n_docs,
        |       CAST((sum(raw) * 1000) // count(*) AS BIGINT)
        |         AS avg_raw_milli,
        |       CAST((sum(norm) * 1000) // count(*) AS BIGINT)
        |         AS avg_norm_milli
        |FROM j GROUP BY source, decile ORDER BY source, decile""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      // both ranks (per-source AND global) run as Ranks.twoPassRank over
      // n_chars-range buckets — the r9 shared definition; the per-source
      // window this used pre-r9 sorted whole sources on one reducer
      val r = Ranks.twoPassRank(docs, Seq("source"),
        expr("n_chars div 256").cast("int"),
        Seq(col("n_chars"), col("doc_id")), rnName = "rk")
      val ns = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      val nn = docs.agg(count(lit(1)).as("n"))
      val g = Ranks.twoPassRank(docs, Nil,
          expr("n_chars div 256").cast("int"),
          Seq(col("n_chars"), col("doc_id")), rnName = "grank")
        .select(col("n_chars").as("v"), col("grank"))
      val m = r.join(broadcast(ns), "source")
        .crossJoin(broadcast(nn))
        .withColumn("gpos",
          expr("((rk - 1) * (n - 1)) div greatest(n_src - 1, 1) + 1"))
      m.join(g, col("grank") === col("gpos"))
        .select(col("source"), col("n_chars").as("raw"), col("v").as("norm"),
          expr("((rk - 1) * 10) div n_src").as("decile"))
        .groupBy(col("source"), col("decile").cast("int").as("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("raw")).as("sr"), sum(col("norm")).as("sn"))
        .select(col("source"), col("decile"), col("n_docs"),
          expr("(sr * 1000) div n_docs").as("avg_raw_milli"),
          expr("(sn * 1000) div n_docs").as("avg_norm_milli"))
        .orderBy(col("source"), col("decile"))
    },

    // ROC-AUC BY RANK-SUM (Mann–Whitney U) — the single-number ranking
    // metric that completes x117's eval gate: the calibration table
    // shows WHERE x93's scorer is miscalibrated, AUC says whether it
    // RANKS positives above negatives at all. Computed without
    // materializing pairs: docs collapse to score-VALUE level (the
    // milli-mean score, offset by +10⁶ so integer `div` = floor on both
    // engines), a running negative count below each value gives every
    // positive its concordant pairs, ties credit ½ via the same-value
    // negative count — auc_num2 = Σ_v pos(v)·(2·neg_below(v) + neg_at(v))
    // is an EXACT INTEGER equal to 2·(wins + ½·ties), and AUC/Gini are
    // single final divisions of it (Round8Spec pins auc_num2 against the
    // brute-force pair count).
    //
    // Scale: doc→value collapse is one hash aggregate over a BOUNDED
    // domain (milli-mean ∈ [0, 2·10⁶], weights ∈ [−1000, 1000]), so the
    // global running-sum window runs over ≤ 2·10⁶ + 1 value rows — a
    // bounded-size table regardless of corpus size (and x118's two-pass
    // prefix scan is the drop-in if the domain were ever unbounded). No
    // doc×doc pair is ever formed. BIGINT bound (ADVICE r8): auc_num2 ≤
    // 2·n_pos·n_neg overflows int64 past ~3·10⁹ docs — Spark's non-ANSI
    // sum wraps while DuckDB widens to HUGEINT; the LIVE escape is the
    // auc_dbl/gini_dbl column pair below (the same numerator summed in
    // doubles — unbounded range, exact-integer terms), emitted and
    // oracle-checked alongside the integer arm at every SF.
    // FILTER FUNNEL WITH PER-RULE ATTRIBUTION — the C4/Gopher cleaning
    // cascade as ONE accountable report: four ordered rules (too-short,
    // low-quality by the shared x08 composite, out-of-scope language,
    // repetitious by intra-doc duplicate-bigram fraction ≥ 10% — every
    // rule fires at every SF, measured before landing), each
    // document attributed to its FIRST failing rule, and the funnel
    // table showing per stage how many documents/chars entered, dropped,
    // and at what rate — the answer to "where did my corpus go?" that a
    // per-rule breakdown of independent filters cannot give (rules
    // overlap; attribution is what sums to 100%). Rule keys carry an
    // a_..e_ prefix so rule order IS sort order on both engines.
    //
    // Scale: per-doc labeling is one scan of pure column expressions
    // (CASE is lazy, so the quality division never runs on the
    // zero-token docs the short rule already caught); the funnel math
    // runs on the 5-row aggregated rule table — its running sum is a
    // bounded-series window (enumerated in the r9 sweep).
    QueryDef("x153_filter_funnel",
      s"""WITH $qualityMSql, rep AS (
        |  SELECT doc_id,
        |         CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS w,
        |         CAST(len(list_distinct(CASE WHEN len(ws) < 2 THEN []
        |           ELSE list_transform(range(len(ws) - 1),
        |                i -> ws[i+1] || '_' || ws[i+2]) END))
        |           AS BIGINT) AS dw
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |), lab AS (
        |  SELECT d.doc_id, d.n_chars,
        |         CASE WHEN m.n_tokens < 12 THEN 'a_short'
        |              WHEN $qualitySql < 0.55 THEN 'b_low_quality'
        |              WHEN d.lang NOT IN ('en', 'de', 'fr') THEN 'c_lang'
        |              WHEN rep.w >= 1 AND 10 * (rep.w - rep.dw) >= rep.w
        |                THEN 'd_repetitious'
        |              ELSE 'e_pass' END AS rule
        |  FROM documents d
        |  JOIN m USING (doc_id)
        |  JOIN rep USING (doc_id)
        |), g AS (
        |  SELECT rule, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS n_chars
        |  FROM lab GROUP BY rule
        |), t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM g)
        |SELECT rule, n_docs, n_chars,
        |       CAST(t.total - coalesce(sum(n_docs) OVER (ORDER BY rule
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) AS entering,
        |       CAST(CASE WHEN rule = 'e_pass' THEN 0
        |            ELSE n_docs * 1000000
        |                 // (t.total - coalesce(sum(n_docs) OVER (
        |                      ORDER BY rule ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND 1 PRECEDING), 0)) END AS BIGINT)
        |         AS drop_ppm
        |FROM g, t ORDER BY rule""".stripMargin) { (s, d) =>
      val ws = Text.tokens(col("text"))
      val repW = greatest(size(ws) - 1, lit(0)).cast("long")
      val repDw = size(Text.shingles(col("text"), 2)).cast("long")
      val lab = Tables.documents(s, d)
        .select(col("n_chars"),
          when(size(ws) < 12, "a_short")
            .when(qualityCol < 0.55, "b_low_quality")
            .when(!col("lang").isin("en", "de", "fr"), "c_lang")
            .when(repW >= 1 && lit(10) * (repW - repDw) >= repW,
              "d_repetitious")
            .otherwise("e_pass").as("rule"))
      val g = lab.groupBy(col("rule"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      val t = g.agg(sum(col("n_docs")).as("total"))
      g.crossJoin(broadcast(t))
        .withColumn("entering", col("total") - coalesce(
          sum(col("n_docs")).over(Window.orderBy(col("rule"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("rule"), col("n_docs"), col("n_chars"), col("entering"),
          when(col("rule") === "e_pass", 0L)
            .otherwise(expr("n_docs * 1000000 div entering"))
            .as("drop_ppm"))
        .orderBy(col("rule"))
    },

    // TOP-P (NUCLEUS) VOCABULARY SIZE — per document, the smallest
    // number of distinct tokens covering ≥ 90% of the token mass, plus
    // the head token's share: the concentration profile behind
    // nucleus-sampling vocabularies and repetition diagnostics (a doc
    // whose 90% nucleus is 3 tokens is boilerplate however long it is;
    // x69's entropy says how concentrated, this says HOW MANY tokens
    // deep the mass sits — the actionable cut). The 10·cum ≥ 9·n test
    // is pure integers; ties among equal counts cannot change the
    // nucleus size (any order of equal values yields the same prefix
    // sums), so no cross-engine tiebreak is needed.
    //
    // Scale: one (doc, word) count aggregate, then per-row array math —
    // the fold runs over each doc's OWN distinct-token counts (bounded
    // per doc), never a corpus-wide structure. The same list_reduce
    // field-ordering rule as x151: the count accumulates LAST so the
    // size test reads the prior cumulative on both engines.
    QueryDef("x154_top_p_vocab",
      """WITH tok AS (
        |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE len(word) > 0 GROUP BY 1, 2
        |), per AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_distinct,
        |         list(c ORDER BY c DESC) AS cs
        |  FROM tok GROUP BY doc_id
        |), folded AS (
        |  SELECT doc_id, n, n_distinct, cs[1] AS top1,
        |         list_reduce(
        |           list_transform(cs, x -> struct_pack(
        |             k := CAST(1 AS BIGINT), cum := x)),
        |           (acc, x) -> struct_pack(
        |             k := acc.k + CASE WHEN 10 * acc.cum < 9 * n
        |                               THEN 1 ELSE 0 END,
        |             cum := acc.cum + x.cum)) AS f
        |  FROM per
        |)
        |SELECT doc_id, n AS n_tokens, n_distinct,
        |       f.k AS top90_size,
        |       CAST(top1 * 1000000 // n AS BIGINT) AS head_share_ppm
        |FROM folded ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      tok.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
          reverse(array_sort(collect_list(col("c")))).as("cs"))
        .withColumn("f", expr(
          """aggregate(
            |  slice(cs, 2, greatest(size(cs) - 1, 0)),
            |  named_struct('k', CAST(1 AS BIGINT), 'cum', cs[0]),
            |  (acc, x) -> named_struct(
            |    'k', acc.k + CASE WHEN 10 * acc.cum < 9 * n
            |                      THEN 1L ELSE 0L END,
            |    'cum', acc.cum + x))""".stripMargin))
        .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
          col("f.k").as("top90_size"),
          expr("cs[0] * 1000000 div n").as("head_share_ppm"))
        .orderBy(col("doc_id"))
    },

    QueryDef("x142_auc_rank",
      s"""WITH $hashedScoreCteSql, $qualityMSql, lab AS (
        |  SELECT doc_id, $qualitySql AS quality
        |  FROM m WHERE n_tokens > 0
        |), j AS (
        |  SELECT sc.doc_id,
        |         CAST((1000 * sc.score_sum + 1000000 * sc.n_tokens)
        |              // sc.n_tokens AS BIGINT) AS sm,
        |         CASE WHEN lab.quality >= 0.63 THEN 1 ELSE 0 END AS pos
        |  FROM sc JOIN lab USING (doc_id)
        |), v AS (
        |  SELECT sm, CAST(sum(pos) AS BIGINT) AS p,
        |         CAST(count(*) - sum(pos) AS BIGINT) AS q
        |  FROM j GROUP BY sm
        |), w AS (
        |  SELECT sm, p, q,
        |         CAST(coalesce(sum(q) OVER (ORDER BY sm
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS q_below
        |  FROM v
        |), a AS (
        |  SELECT CAST(sum(p) AS BIGINT) AS n_pos,
        |         CAST(sum(q) AS BIGINT) AS n_neg,
        |         CAST(count(*) AS BIGINT) AS n_values,
        |         CAST(sum(p * (2 * q_below + q)) AS BIGINT) AS auc_num2,
        |         sum(CAST(p AS DOUBLE) * (2 * q_below + q)) AS num_dbl
        |  FROM w
        |)
        |SELECT n_pos, n_neg, n_values, auc_num2,
        |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |            ELSE round(1e-9 + auc_num2 * 0.5 / (n_pos * n_neg), 6)
        |       END AS auc,
        |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |            ELSE round(1e-9 + (auc_num2 * 1.0 / (n_pos * n_neg) - 1),
        |                       6)
        |       END AS gini,
        |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |            ELSE round(1e-9 + num_dbl * 0.5
        |                       / (CAST(n_pos AS DOUBLE) * n_neg), 6)
        |       END AS auc_dbl,
        |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |            ELSE round(1e-9 + num_dbl
        |                       / (CAST(n_pos AS DOUBLE) * n_neg) - 1, 6)
        |       END AS gini_dbl
        |FROM a""".stripMargin) { (s, d) =>
      val sc = hashedScoreTable(s, d)
        .select(col("doc_id"),
          expr("(1000 * score_sum + 1000000 * n_tokens) div n_tokens")
            .as("sm"))
      val lab = Tables.documents(s, d)
        .filter(size(Text.tokens(col("text"))) > 0)
        .select(col("doc_id"), qualityCol.as("quality"))
      val v = sc.join(lab, "doc_id")
        .select(col("sm"),
          when(col("quality") >= 0.63, 1L).otherwise(0L).as("pos"))
        .groupBy(col("sm"))
        .agg(sum(col("pos")).as("p"),
          (count(lit(1)) - sum(col("pos"))).as("q"))
      val w = v.withColumn("q_below", coalesce(
        sum(col("q")).over(Window.orderBy(col("sm"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      w.agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
          count(lit(1)).as("n_values"),
          sum(col("p") * (lit(2L) * col("q_below") + col("q")))
            .as("auc_num2"),
          // the DOUBLE arm (VERDICT r9 item 4): the same numerator summed
          // in doubles — unbounded range past the int64 wrap at ~3·10⁹
          // docs. Hash-parity holds because every term is an exact
          // integer and partial sums stay under 2⁵³ at any SF the exact
          // arm itself survives; past 2⁵³ the two arms diverge in the
          // last ulp and the INTEGER arm is the one that's wrong (wrapped)
          sum(col("p").cast("double")
            * (lit(2L) * col("q_below") + col("q"))).as("num_dbl"))
        .select(col("n_pos"), col("n_neg"), col("n_values"), col("auc_num2"),
          // guarded like x145: a one-sided corpus (every doc on one side
          // of the 0.63 threshold) is a DESIGNED NULL, not an accidental
          // one — the same CASE on both engines (ADVICE r8)
          when(col("n_pos") === 0 || col("n_neg") === 0,
            lit(null).cast("double"))
            .otherwise(Num.roundOut(
              col("auc_num2") * 0.5 / (col("n_pos") * col("n_neg")), 6))
            .as("auc"),
          when(col("n_pos") === 0 || col("n_neg") === 0,
            lit(null).cast("double"))
            .otherwise(Num.roundOut(
              col("auc_num2") * 1.0 / (col("n_pos") * col("n_neg")) - 1.0,
              6))
            .as("gini"),
          when(col("n_pos") === 0 || col("n_neg") === 0,
            lit(null).cast("double"))
            .otherwise(Num.roundOut(col("num_dbl") * 0.5
              / (col("n_pos").cast("double") * col("n_neg")), 6))
            .as("auc_dbl"),
          when(col("n_pos") === 0 || col("n_neg") === 0,
            lit(null).cast("double"))
            .otherwise(Num.roundOut(col("num_dbl")
              / (col("n_pos").cast("double") * col("n_neg")) - 1.0, 6))
            .as("gini_dbl"))
    },

    // JENSEN–SHANNON SOURCE DIVERGENCE — the distribution-level drift
    // monitor over WORD CHOICE that x156's KS (lengths) and x99
    // (embeddings) don't give: for each source, JSD between its unigram
    // distribution and the pooled rest of the corpus, over the corpus
    // top-32 vocabulary plus an OOV bucket. The "which source stopped
    // speaking like the others" tripwire.
    //
    // Exactness: distributions are ppm-quantized integers (c·10⁶ div N —
    // the x156 discipline), and JSD folds in the entropy form
    // Σ max(0, a·L(a) + b·L(b) − s·L(s) + s·ln2) / 2 with
    // L = x80's piecewise mantissa ln6 (ln(2u) ≡ L(u) + Ln2Fp6 BY
    // DEFINITION of the piecewise log, so one decomposition serves all
    // three arguments). Every accumulation is an exact long sum — the
    // output is an integer micro-nat value, no FP op anywhere. The
    // max(0,·) is the knot-error floor: each word's true JSD term is
    // ≥ 0 by the log-sum inequality; the ±1/128-knot piecewise L can
    // dip a near-zero term slightly negative, and clamping (identically
    // on both engines, before the nonneg integer division) keeps the
    // fold sign-stable. Bounds: a, b ≤ 10⁶ by quantization, so
    // u·L(u) ≤ 2·10⁶ · 14.6·10⁶ ≈ 3·10¹³ and the 33-row per-source sum
    // stays ≤ 10¹⁵ at ANY corpus size; the ppm divisions c·10⁶ stay in
    // a long to ~9·10¹² tokens (x156's documented bound).
    //
    // Scale: one pass over the persisted token table collapses map-side
    // to (source × word) counts; the vocabulary is a top-32
    // TakeOrderedAndProject; everything after runs on the
    // sources×33 grid — bounded by design, not by corpus.
    QueryDef("x157_source_jsd",
      s"""WITH $sourceVocabCteSql, u3 AS (
        |  SELECT source, wid, 'a' AS tag, a AS u, CAST(1 AS BIGINT) AS sgn
        |  FROM ab
        |  UNION ALL
        |  SELECT source, wid, 'b', b, CAST(1 AS BIGINT) FROM ab
        |  UNION ALL
        |  SELECT source, wid, 's', a + b, CAST(-1 AS BIGINT) FROM ab
        |), uz AS (
        |  SELECT * FROM u3 WHERE u > 0
        |), p2(k, v) AS (
        |  VALUES $pow2ValuesSql
        |), fl AS (
        |  SELECT source, wid, tag, u, sgn, max(k) AS kk
        |  FROM uz JOIN p2 ON p2.v <= uz.u GROUP BY 1, 2, 3, 4, 5
        |), lnt(lk, lq) AS (
        |  VALUES $ln6ValuesSql
        |), lv AS (
        |  SELECT source, wid,
        |         sgn * u * (CAST(lq AS BIGINT)
        |           + greatest(kk - 6, 0) * $Ln2Fp6) AS contrib
        |  FROM (SELECT source, wid, tag, u, sgn, kk,
        |               u >> greatest(kk - 6, 0) AS m FROM fl) f
        |  JOIN lnt ON lnt.lk = f.m
        |), pt AS (
        |  SELECT source, wid, CAST(sum(contrib) AS BIGINT) AS t1
        |  FROM lv GROUP BY 1, 2
        |), term AS (
        |  SELECT ab.source, ab.wid, ab.word,
        |         greatest(COALESCE(pt.t1, 0)
        |           + (ab.a + ab.b) * $Ln2Fp6, 0) AS term
        |  FROM ab LEFT JOIN pt
        |    ON pt.source = ab.source AND pt.wid = ab.wid
        |), agg AS (
        |  SELECT source, CAST(sum(term) AS BIGINT) AS ssum
        |  FROM term GROUP BY 1
        |), top AS (
        |  SELECT source, word, term, row_number() OVER (
        |    PARTITION BY source ORDER BY term DESC, wid) AS rn
        |  FROM term
        |), oovp AS (
        |  SELECT source, a AS oov_ppm FROM ab WHERE wid = 33
        |)
        |SELECT agg.source, srcs.n_s AS n_tokens, oovp.oov_ppm,
        |       CAST(ssum // 2000000 AS BIGINT) AS jsd_micro,
        |       top.word AS top_word,
        |       CAST(top.term // 2000000 AS BIGINT) AS top_term_micro
        |FROM agg
        |JOIN srcs ON srcs.source = agg.source
        |JOIN oovp ON oovp.source = agg.source
        |JOIN top ON top.source = agg.source AND top.rn = 1
        |ORDER BY agg.source""".stripMargin) { (s, d) =>
      import s.implicits._
      val ab = sourceVocabGrid(s, d)
        .localCheckpoint() // sources×33 rows; read by u3, term, oovp
      val u3 = ab.select(col("source"), col("wid"),
          expr("stack(3, 'a', a, 'b', b, 's', a + b)").as(Seq("tag", "u")))
        .withColumn("sgn", when(col("tag") === "s", -1L).otherwise(1L))
        .filter(col("u") > 0)
      val p2 = broadcast(pow2Table.toDF("k", "v"))
      val lnt = broadcast(ln6Table.toDF("lk", "lq"))
      val fl = u3.join(p2, col("v") <= col("u"))
        .groupBy(col("source"), col("wid"), col("tag"), col("u"), col("sgn"))
        .agg(max(col("k")).as("kk"))
      val pt = fl
        .withColumn("sh", greatest(col("kk") - 6, lit(0)))
        .withColumn("m", expr("shiftright(u, sh)"))
        .join(lnt, col("lk") === col("m"))
        .select(col("source"), col("wid"),
          (col("sgn") * col("u")
            * (col("lq") + col("sh") * lit(Ln2Fp6))).as("contrib"))
        .groupBy(col("source"), col("wid"))
        .agg(sum(col("contrib")).as("t1"))
      val term = ab.join(pt, Seq("source", "wid"), "left")
        .select(col("source"), col("wid"), col("word"),
          greatest(coalesce(col("t1"), lit(0L))
            + (col("a") + col("b")) * lit(Ln2Fp6), lit(0L)).as("term"))
        .localCheckpoint() // sources×33 rows; read by agg and top
      val agg = term.groupBy(col("source")).agg(sum(col("term")).as("ssum"))
      val top = term.withColumn("rn", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("term").desc, col("wid"))))
        .filter(col("rn") === 1)
        .select(col("source"), col("word").as("top_word"),
          expr("term div 2000000").as("top_term_micro"))
      val oovp = ab.filter(col("wid") === 33)
        .select(col("source"), col("n_s"), col("a").as("oov_ppm"))
      agg.join(broadcast(oovp), "source")
        .join(broadcast(top), "source")
        .select(col("source"), col("n_s").as("n_tokens"), col("oov_ppm"),
          expr("ssum div 2000000").as("jsd_micro"),
          col("top_word"), col("top_term_micro"))
        .orderBy(col("source"))
    },

    // SOURCE VOCABULARY SIGNATURE — the per-source DISTINCTIVE-word
    // profile the scalar x157 JSD can't give: over the same top-32 + OOV
    // ppm grid (one definition), each word's usage lift vs the pooled
    // rest (a·10⁶ div max(b,1), exact integers), top-3 per source with a
    // 0.1% usage floor. The contamination fingerprint: a source whose
    // signature suddenly features a new word drifted — and WHICH word
    // names the leak. Lift over QUANTIZED distributions is the designed
    // metric (x156/x157's discipline), so the rank order is an exact
    // integer order shared by both engines; the rank window runs on the
    // sources×33 grid — bounded at any corpus size.
    QueryDef("x166_source_signature",
      s"""WITH $sourceVocabCteSql, sc AS (
        |  SELECT source, wid, word, a, b,
        |         a * 1000000 // greatest(b, 1) AS lift_ppm
        |  FROM ab WHERE a >= 1000
        |), r AS (
        |  SELECT source, wid, word, a, b, lift_ppm, row_number() OVER (
        |    PARTITION BY source ORDER BY lift_ppm DESC, wid) AS rnk
        |  FROM sc
        |)
        |SELECT source, CAST(rnk AS INT) AS rnk, word,
        |       a AS a_ppm, b AS rest_ppm, lift_ppm
        |FROM r WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin) { (s, d) =>
      val sc = sourceVocabGrid(s, d)
        .filter(col("a") >= 1000)
        .select(col("source"), col("wid"), col("word"), col("a"), col("b"),
          expr("a * 1000000 div greatest(b, 1)").as("lift_ppm"))
      sc.withColumn("rnk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("lift_ppm").desc, col("wid"))))
        .filter(col("rnk") <= 3)
        .select(col("source"), col("rnk"), col("word"),
          col("a").as("a_ppm"), col("b").as("rest_ppm"), col("lift_ppm"))
        .orderBy(col("source"), col("rnk"))
    },

    // PACKED-BIN INTERLEAVING AUDIT — the shuffle-quality check on
    // x18's training shards (poorly interleaved packs put long
    // same-source runs in one context window → gradient correlation and
    // loss spikes): per (shard, bin), how many distinct sources landed
    // in the bin, the dominant source's share (ppm), and the LONGEST
    // same-source run under the pack's document order — with the
    // verdict flag a data loader gates on (no source majority and no
    // run over 2). Same shard/bin derivation as x18 (shared fingerprint
    // artifact, same cumulative window), so the audit describes exactly
    // the packs x18 emits.
    //
    // Scale: the pack assignment is x18's per-shard window; every audit
    // window after that is PARTITIONED by (shard, bin) whose size is
    // capped by the token budget (≈ budget / min-doc-tokens docs) — a
    // bounded partition at any corpus size. Run detection is one lag +
    // one running-sum over those bounded partitions; the report
    // aggregates bins map-side.
    QueryDef("x167_pack_interleaving",
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST($fingerprintSql % 4 AS INT) AS shard
        |  FROM documents
        |), c AS (
        |  SELECT shard, doc_id, source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           - n_tokens AS cum_before
        |  FROM t
        |), b AS (
        |  SELECT shard, CAST(floor(cum_before / 2048.0) AS INT) AS bin,
        |         doc_id, source
        |  FROM c
        |), rr AS (
        |  SELECT shard, bin, doc_id, source,
        |         CASE WHEN lag(source) OVER (PARTITION BY shard, bin
        |                ORDER BY doc_id) IS DISTINCT FROM source
        |              THEN 1 ELSE 0 END AS brk
        |  FROM b
        |), rid AS (
        |  SELECT shard, bin, source,
        |         sum(brk) OVER (PARTITION BY shard, bin ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS run_id
        |  FROM rr
        |), runs AS (
        |  SELECT shard, bin, run_id, CAST(count(*) AS BIGINT) AS rl
        |  FROM rid GROUP BY 1, 2, 3
        |), srcs AS (
        |  SELECT shard, bin, source, CAST(count(*) AS BIGINT) AS sc
        |  FROM b GROUP BY 1, 2, 3
        |), agg AS (
        |  SELECT shard, bin, CAST(sum(sc) AS BIGINT) AS n_docs,
        |         CAST(count(*) AS BIGINT) AS n_sources,
        |         CAST(max(sc) AS BIGINT) AS dom
        |  FROM srcs GROUP BY 1, 2
        |), mr AS (
        |  SELECT shard, bin, CAST(max(rl) AS BIGINT) AS max_run
        |  FROM runs GROUP BY 1, 2
        |)
        |SELECT agg.shard, agg.bin, agg.n_docs, agg.n_sources,
        |       CAST(dom * 1000000 // n_docs AS BIGINT) AS dominant_ppm,
        |       mr.max_run,
        |       2 * dom <= n_docs AND mr.max_run <= 2 AS interleave_ok
        |FROM agg JOIN mr ON mr.shard = agg.shard AND mr.bin = agg.bin
        |ORDER BY agg.shard, agg.bin""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bw = Window.partitionBy(col("shard"), col("bin"))
        .orderBy(col("doc_id"))
      val b = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .join(fingerprintTable(s, d), "doc_id")
        .select((col("fp") % 4).cast("int").as("shard"), col("doc_id"),
          col("source"), col("n_tokens"))
        .withColumn("cum_before",
          sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("shard"),
          floor(col("cum_before") / 2048.0).cast("int").as("bin"),
          col("doc_id"), col("source"))
        .localCheckpoint() // run detection + source counts both read it
      val runs = b
        .withColumn("brk", when(not(lag(col("source"), 1).over(bw)
          <=> col("source")), 1).otherwise(0))
        .withColumn("run_id", sum(col("brk")).over(
          bw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("shard"), col("bin"), col("run_id"))
        .agg(count(lit(1)).as("rl"))
        .groupBy(col("shard"), col("bin"))
        .agg(max(col("rl")).as("max_run"))
      val agg = b.groupBy(col("shard"), col("bin"), col("source"))
        .agg(count(lit(1)).as("sc"))
        .groupBy(col("shard"), col("bin"))
        .agg(sum(col("sc")).as("n_docs"), count(lit(1)).as("n_sources"),
          max(col("sc")).as("dom"))
      agg.join(runs, Seq("shard", "bin"))
        .select(col("shard"), col("bin"), col("n_docs"), col("n_sources"),
          expr("dom * 1000000 div n_docs").as("dominant_ppm"),
          col("max_run"),
          (lit(2) * col("dom") <= col("n_docs")
            && col("max_run") <= 2).as("interleave_ok"))
        .orderBy(col("shard"), col("bin"))
    },

    // KENDALL τ-b: LENGTH ↔ QUALITY — the sampling-bias check behind
    // every length-based curriculum (if quality and length co-move, a
    // length cut silently shifts quality): rank correlation between
    // doc length (log2 buckets — order-preserving, from the pow2 glb
    // join, no FP log) and the x08 composite quality (deci-buckets via
    // round-to-int-then-divide, so the 4-decimal rounding boundary can
    // never flip a bucket cross-engine). τ-b computes EXACTLY from the
    // bounded contingency grid: concordant/discordant pair counts are
    // a cells² self-join (≤ ~150 cells at any corpus size — pair
    // algebra over counts, never over docs), tie terms from row/col
    // marginals, all exact longs; the denominator multiplies as DOUBLE
    // (the exact (n₀−n₁)(n₀−n₂) product leaves int64 past ~3·10⁹ docs
    // — x142's documented overflow discipline) for the single final
    // division. Goodman-Kruskal γ rides along free (guarded when
    // C+D = 0).
    //
    // Scale: one corpus pass collapses to the grid; everything after
    // is cells-sized. The bucket granularity is the designed metric —
    // τ-b here IS the τ-b of the bucketed ordinal pair, stated as
    // such (the continuous-value τ needs a distributed merge-sort
    // inversion count; the bucket grid is the warehouse form).
    QueryDef("x172_length_quality_tau",
      s"""WITH $qualityMSql, p2(k, v) AS (
        |  VALUES $pow2ValuesSql
        |), b AS (
        |  SELECT doc_id,
        |         CAST(round($qualitySql * 10000) AS BIGINT) // 1000 AS qb,
        |         n_tokens
        |  FROM m WHERE n_tokens > 0
        |), lb AS (
        |  SELECT doc_id, qb, max(k) AS lb
        |  FROM b JOIN p2 ON p2.v <= b.n_tokens GROUP BY 1, 2
        |), grid AS (
        |  SELECT lb, qb, CAST(count(*) AS BIGINT) AS n
        |  FROM lb GROUP BY 1, 2
        |), cd AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN b.lb > a.lb AND b.qb > a.qb
        |                       THEN a.n * b.n END), 0) AS BIGINT) AS c,
        |    CAST(coalesce(sum(CASE WHEN b.lb > a.lb AND b.qb < a.qb
        |                       THEN a.n * b.n END), 0) AS BIGINT) AS d
        |  FROM grid a CROSS JOIN grid b
        |), rows_ AS (
        |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1 FROM (
        |    SELECT CAST(sum(n) AS BIGINT) AS t FROM grid GROUP BY lb)
        |), cols_ AS (
        |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2 FROM (
        |    SELECT CAST(sum(n) AS BIGINT) AS t FROM grid GROUP BY qb)
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |         CAST(count(*) AS BIGINT) AS n_cells FROM grid
        |)
        |SELECT tot.nn AS n_docs, tot.n_cells, cd.c AS concordant,
        |       cd.d AS discordant, rows_.n1 AS ties_len, cols_.n2 AS ties_q,
        |       round(1e-9 + (cd.c - cd.d)
        |         / sqrt(CAST(nn * (nn - 1) // 2 - n1 AS DOUBLE)
        |                * CAST(nn * (nn - 1) // 2 - n2 AS DOUBLE)), 6)
        |         AS tau_b,
        |       CASE WHEN cd.c + cd.d = 0 THEN NULL
        |            ELSE round(1e-9 + (cd.c - cd.d) * 1.0 / (cd.c + cd.d), 6)
        |       END AS gamma
        |FROM tot CROSS JOIN cd CROSS JOIN rows_ CROSS JOIN cols_""".stripMargin) {
      (s, d) =>
      import s.implicits._
      val b = Tables.documents(s, d)
        .select(col("doc_id"),
          (round(qualityCol * 10000).cast("long")).as("q4"),
          size(Text.tokens(col("text"))).as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), expr("q4 div 1000").as("qb"), col("n_tokens"))
      val p2 = broadcast(pow2Table.toDF("k", "v"))
      val grid = b.join(p2, col("v") <= col("n_tokens"))
        .groupBy(col("doc_id"), col("qb")).agg(max(col("k")).as("lb"))
        .groupBy(col("lb"), col("qb")).agg(count(lit(1)).as("n"))
        .localCheckpoint() // ≤ cells rows; five readers below
      val cd = grid.select(col("lb").as("la"), col("qb").as("qa"),
          col("n").as("na"))
        .crossJoin(broadcast(grid.select(col("lb").as("lbb"),
          col("qb").as("qbb"), col("n").as("nb"))))
        .agg(coalesce(sum(when(col("lbb") > col("la")
            && col("qbb") > col("qa"), col("na") * col("nb"))), lit(0L))
            .as("c"),
          coalesce(sum(when(col("lbb") > col("la")
            && col("qbb") < col("qa"), col("na") * col("nb"))), lit(0L))
            .as("d"))
      val n1 = grid.groupBy(col("lb")).agg(sum(col("n")).as("t"))
        .agg(sum(expr("t * (t - 1) div 2")).as("n1"))
      val n2 = grid.groupBy(col("qb")).agg(sum(col("n")).as("t"))
        .agg(sum(expr("t * (t - 1) div 2")).as("n2"))
      val tot = grid.agg(sum(col("n")).as("nn"),
        count(lit(1)).as("n_cells"))
      tot.crossJoin(broadcast(cd)).crossJoin(broadcast(n1))
        .crossJoin(broadcast(n2))
        .select(col("nn").as("n_docs"), col("n_cells"),
          col("c").as("concordant"), col("d").as("discordant"),
          col("n1").as("ties_len"), col("n2").as("ties_q"),
          Num.roundOut((col("c") - col("d"))
            / sqrt(expr("CAST(nn * (nn - 1) div 2 - n1 AS DOUBLE)")
              * expr("CAST(nn * (nn - 1) div 2 - n2 AS DOUBLE)")), 6)
            .as("tau_b"),
          when(col("c") + col("d") === 0, lit(null).cast("double"))
            .otherwise(Num.roundOut((col("c") - col("d")) * 1.0
              / (col("c") + col("d")), 6)).as("gamma"))
    },

    // CHI-SQUARE INDEPENDENCE + CRAMÉR'S V over lang × source — the
    // NOMINAL association check beside x172's ordinal τ-b: is language
    // balanced across sources, or does the mixing policy (x81/x53) face
    // a confounded grid? The full zero-filled contingency grid (langs ×
    // sources — group-cardinality-bounded) is rebuilt from marginals so
    // empty cells contribute their expected mass; each cell's χ²
    // contribution (O·n − r·s)²/(n·r·s) is ONE double product of an
    // exact BIGINT deviation and one division by the exact BIGINT
    // product (identical IEEE ops cross-engine), rounded to micro units
    // per cell and SUMMED AS INTEGERS — no float accumulation order to
    // drift. n·r·s stays in int64 to ~2·10⁶ docs per lang×source
    // stripe; past that the cell math goes DOUBLE (the x142 note).
    // One-row/one-column degenerate grids report NULL V by design.
    //
    // Scale: one corpus pass to the nonzero cells (map-side combine);
    // marginals, grid, and report are all cells-sized.
    QueryDef("x179_cramers_v",
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2
        |), rl AS (
        |  SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1
        |), cs AS (
        |  SELECT source, CAST(sum(o) AS BIGINT) AS s FROM cells GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(o) AS BIGINT) AS n,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS nr,
        |         CAST(count(DISTINCT source) AS BIGINT) AS nc
        |  FROM cells
        |), grid AS (
        |  SELECT rl.lang, cs.source, rl.r, cs.s,
        |         COALESCE(cells.o, 0) AS o
        |  FROM rl CROSS JOIN cs
        |  LEFT JOIN cells ON cells.lang = rl.lang
        |                 AND cells.source = cs.source
        |), dev AS (
        |  SELECT r, s, o, o * tot.n - r * s AS dd, tot.n AS n
        |  FROM grid CROSS JOIN tot
        |), mic AS (
        |  SELECT CAST(sum(CAST(round(1e-9 + dd * 1.0 * dd
        |             / (n * r * s) * 1000000) AS BIGINT)) AS BIGINT)
        |           AS chi_micro
        |  FROM dev
        |)
        |SELECT tot.n AS n_docs, tot.nr AS n_langs, tot.nc AS n_sources,
        |       (tot.nr - 1) * (tot.nc - 1) AS dof,
        |       round(1e-9 + mic.chi_micro / 1000000.0, 4) AS chi2,
        |       CASE WHEN least(tot.nr, tot.nc) = 1 THEN NULL
        |            ELSE round(1e-9 + sqrt(mic.chi_micro / 1000000.0
        |                 / (tot.n * (least(tot.nr, tot.nc) - 1))), 6)
        |       END AS cramers_v
        |FROM tot CROSS JOIN mic""".stripMargin) { (s, d) =>
      val cells = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint() // cells-bounded; marginals + grid read it
      val rl = cells.groupBy(col("lang")).agg(sum(col("o")).as("r"))
      val cs = cells.groupBy(col("source")).agg(sum(col("o")).as("s"))
      val tot = cells.agg(sum(col("o")).as("n"),
        countDistinct(col("lang")).as("nr"),
        countDistinct(col("source")).as("nc"))
      val grid = rl.crossJoin(cs)
        .join(cells, Seq("lang", "source"), "left")
        .select(col("r"), col("s"), coalesce(col("o"), lit(0L)).as("o"))
      val mic = grid.crossJoin(broadcast(tot))
        .select((col("o") * col("n") - col("r") * col("s")).as("dd"),
          col("n"), col("r"), col("s"))
        .select(round(lit(1e-9) + col("dd") * 1.0 * col("dd")
          / (col("n") * col("r") * col("s")) * 1000000).cast("long")
          .as("cm"))
        .agg(sum(col("cm")).as("chi_micro"))
      tot.crossJoin(broadcast(mic))
        .select(col("n").as("n_docs"), col("nr").as("n_langs"),
          col("nc").as("n_sources"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          Num.roundOut(col("chi_micro") / 1000000.0, 4).as("chi2"),
          when(least(col("nr"), col("nc")) === 1,
            lit(null).cast("double"))
            .otherwise(Num.roundOut(sqrt(col("chi_micro") / 1000000.0
              / (col("n") * (least(col("nr"), col("nc")) - 1))), 6))
            .as("cramers_v"))
    }
  )

  /** The source×(top-32 vocab + OOV) ppm grid — x157 (JSD) and x166
    * (signature lift) read the same (source, n_s, wid, word, a, b)
    * table, one definition on each engine so the two drift views can't
    * disagree about the distributions. Defs, not vals (`entries`
    * initializes first — the x69 lnq lesson). */
  private[operators] def sourceVocabCteSql: String =
    """ds AS (
      |  SELECT doc_id, source FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |                 w -> len(w) > 0)) AS word
      |  FROM documents
      |), tc AS (
      |  SELECT ds.source, tok.word, CAST(count(*) AS BIGINT) AS c
      |  FROM tok JOIN ds ON tok.doc_id = ds.doc_id GROUP BY 1, 2
      |), gw AS (
      |  SELECT word, CAST(sum(c) AS BIGINT) AS cg FROM tc GROUP BY 1
      |), voc AS (
      |  SELECT word, cg, CAST(row_number() OVER (
      |           ORDER BY cg DESC, word) AS INT) AS wid
      |  FROM (SELECT * FROM gw ORDER BY cg DESC, word LIMIT 32)
      |), vs AS (
      |  SELECT CAST(sum(cg) AS BIGINT) AS cgv FROM voc
      |), srcs AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM tc GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n FROM tc
      |), sv AS (
      |  SELECT s.source, s.n_s, v.word, v.wid, COALESCE(tc.c, 0) AS c
      |  FROM srcs s CROSS JOIN voc v
      |  LEFT JOIN tc ON tc.source = s.source AND tc.word = v.word
      |), svo AS (
      |  SELECT source, n_s, word, wid, c FROM sv
      |  UNION ALL
      |  SELECT source, n_s, 'OOV', CAST(33 AS INT),
      |         n_s - CAST(sum(c) AS BIGINT)
      |  FROM sv GROUP BY source, n_s
      |), allw AS (
      |  SELECT wid, cg AS cw FROM voc
      |  UNION ALL
      |  SELECT CAST(33 AS INT), n - cgv FROM tot CROSS JOIN vs
      |), ab AS (
      |  SELECT svo.source, svo.n_s, svo.wid, svo.word,
      |         svo.c * 1000000 // svo.n_s AS a,
      |         CASE WHEN tot.n = svo.n_s THEN NULL
      |              ELSE (allw.cw - svo.c) * 1000000 // (tot.n - svo.n_s)
      |         END AS b
      |  FROM svo JOIN allw ON allw.wid = svo.wid CROSS JOIN tot
      |)""".stripMargin

  private[operators] def sourceVocabGrid(
      s: SparkSession, d: String): DataFrame = {
    val ds = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val tc = Tokens.table(s, d)
      .filter(length(col("word")) > 0)
      .join(ds, "doc_id")
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // read by gw, srcs, tot, and the grid probe
    val gw = tc.groupBy(col("word")).agg(sum(col("c")).as("cg"))
    val voc = gw.orderBy(col("cg").desc, col("word")).limit(32)
      .withColumn("wid", row_number().over(
        Window.orderBy(col("cg").desc, col("word"))))
      .localCheckpoint() // 32 rows; read by vs, the grid, and allw
    val vs = voc.agg(sum(col("cg")).as("cgv"))
    val srcs = tc.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val tot = tc.agg(sum(col("c")).as("n"))
    val sv = srcs.crossJoin(broadcast(voc))
      .join(tc, Seq("source", "word"), "left")
      .select(col("source"), col("n_s"), col("word"), col("wid"),
        coalesce(col("c"), lit(0L)).as("c"))
    val svo = sv.unionByName(
      sv.groupBy(col("source"), col("n_s"))
        .agg((col("n_s") - sum(col("c"))).as("c"))
        .select(col("source"), col("n_s"), lit("OOV").as("word"),
          lit(33).as("wid"), col("c")))
    val allw = voc.select(col("wid"), col("cg").as("cw")).unionByName(
      tot.crossJoin(broadcast(vs))
        .select(lit(33).as("wid"), (col("n") - col("cgv")).as("cw")))
    svo.join(broadcast(allw), "wid").crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"), col("wid"), col("word"),
        expr("c * 1000000 div n_s").as("a"),
        // a degenerate single-source corpus (n = n_s: no "rest" to
        // compare against) is a DESIGNED NULL — the same CASE on both
        // engines (x178/x142's rule), never the engine's accidental
        // div-by-zero NULL (ADVICE r9)
        expr("CASE WHEN n = n_s THEN NULL " +
          "ELSE (cw - c) * 1000000 div (n - n_s) END").as("b"))
  }

  /** x124's implementation (factored out of the entry for length only). */
  private def x124Impl(s: SparkSession, d: String): DataFrame = {
    val ws = Tokens.table(s, d)
      .filter(length(col("word")) > 0)
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id")
      .select(col("source"), col("word"))
      .distinct()
      .localCheckpoint() // both pair sides + the size table read it
    val sz = ws.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val p = ws.as("a")
      .join(ws.as("b"),
        col("a.word") === col("b.word") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("i"))
    p.join(broadcast(sz.select(col("source").as("src_a"), col("v").as("va"))),
        "src_a")
      .join(broadcast(sz.select(col("source").as("src_b"), col("v").as("vb"))),
        "src_b")
      .select(col("src_a"), col("src_b"), col("i").as("n_shared"),
        Num.roundOut(col("i") * 1.0 / (col("va") + col("vb") - col("i")), 6)
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The DISTINCT train-split trigram set persisted content-keyed — the
    * decontamination reference set x19's exact join probes and x55's
    * bloom bitset is built over (single-sourced, one artifact; before
    * this both consumers re-ran the explode+distinct shuffle per query).
    * At 100 TB this is the eval-protection side table every training run
    * keeps next to the corpus. */
  private[operators] def trainGramTable(s: SparkSession, d: String): DataFrame =
    DerivedTable(s, d, "documents", "traingrams") {
      Dedup.shingleTable(s, d)
        .join(fingerprintTable(s, d), "doc_id")
        .filter(col("fp") % 100 < 80)
        .select(explode(col("tri")).as("g")).distinct()
    }

  /** Fixed-point ln table for x69: k → round(ln(k)·10¹²), k = 1..128
    * (token counts per doc are ≤ 100 in the fixture; the query guards the
    * bound). Generated ONCE here and used by BOTH engines (x62's ln-table
    * move) — and because the entries are INTEGERS, the per-doc entropy
    * accumulation Σ c·lnq(c) is an exact long sum: order-independent
    * across partitions, so the one float division at the end is the only
    * FP op and is bit-identical cross-engine. */
  private[operators] lazy val lnqTable: Seq[(Long, Long)] =
    (1 to 128).map(k => k.toLong -> math.round(math.log(k.toDouble) * 1e12))

  private[operators] def lnqValuesSql: String =
    lnqTable.map { case (k, q) => s"($k, $q)" }.mkString(", ")

  /** x69's table generalized to UNBOUNDED counts (x80): ln at 10⁶ scale via
    * the mantissa decomposition n = m·2^s with m = n >> s held in [64, 127]
    * (s = floor(log2 n) − 6, clamped at 0), so
    * ln6(n) := ln6Table(m) + s·[[Ln2Fp6]]. floor(log2) comes from a
    * 63-row powers-of-two broadcast (greatest-lower-bound join), the shift
    * and table lookup are pure integer ops — both engines compute the
    * IDENTICAL piecewise-log (truncating the mantissa to 7 bits costs
    * < 1/128 relative knot error, irrelevant to a regression slope and
    * bit-identical cross-engine, which is what the hash compare needs).
    * The 10⁶ scale (not x69's 10¹²) keeps 32-point OLS second moments
    * inside a long: values ≤ 4.4e7 (n ≤ 2⁶²), squares ≤ 2e15, R·Σy² ≤ 2e18. */
  private[operators] lazy val ln6Table: Seq[(Long, Long)] =
    (1 to 128).map(k => k.toLong -> math.round(math.log(k.toDouble) * 1e6))

  private[operators] def ln6ValuesSql: String =
    ln6Table.map { case (k, q) => s"($k, $q)" }.mkString(", ")

  /** round(ln(2)·10⁶) — the per-octave step of the piecewise ln6.
    * `final val` with a literal body so it CONSTANT-FOLDS at use sites:
    * `entries` (a strict val declared earlier in this object) interpolates
    * it into oracle SQL during object init, before a plain field's
    * initializer would have run — a plain `val` here reads as 0 there. */
  private[operators] final val Ln2Fp6 = 693147L

  /** 2^0 .. 2^62 for floor-log2 by greatest-lower-bound join (shared by
    * x80's mantissa ln and x82's next-power-of-two bucket caps). */
  private[operators] lazy val pow2Table: Seq[(Int, Long)] =
    (0 to 62).map(k => k -> (1L << k))

  private[operators] def pow2ValuesSql: String =
    pow2Table.map { case (k, v) => s"($k, ${v}::BIGINT)" }.mkString(", ")

  /** Salted two-level bottom-k by (pri, event_id) priority within
    * event_type — never sorts a whole group on one reducer; provably
    * equal to the single global window because the priority order is
    * total. Exposed for SampleMergeSpec's merge-property pin. */
  private[graft] def quantileSample(pv: DataFrame, k: Int): DataFrame = {
    val local = pv
      .withColumn("salt", pmod(col("event_id"), lit(32)))
      .withColumn("rn1", row_number().over(
        Window.partitionBy(col("event_type"), col("salt"))
          .orderBy(col("pri"), col("event_id"))))
      .filter(col("rn1") <= k)
    local
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("pri"), col("event_id"))))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("event_id"), col("value"), col("pri"))
  }
}
