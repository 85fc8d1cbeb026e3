package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shared AQE-aware physical-plan walker for plan-shape pins. */
object PlanWalk {
  def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case q: QueryStageExec => collectAll(q.plan)
      case other => other.children.flatMap(collectAll)
    }
    p +: below
  }

  def executedAll(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    collectAll(df.queryExecution.executedPlan)
  }
}

/** Pins the physical-plan claims SCALING.md makes: dimension joins
  * broadcast (fact side never shuffles for them), filters reach the
  * parquet scan, and no candidate-generation pipeline ever degenerates to
  * a cartesian product. */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestSession._
  import PlanWalk._

  test("q01 flagship: bucket + daily dims join via broadcast, fact side shuffles only for aggregation") {
    val nodes = executedAll(SparkEntry.queries("q01_flagship")(spark, sf0_001))
    val broadcasts = nodes.count {
      case _: BroadcastHashJoinExec | _: BroadcastNestedLoopJoinExec => true
      case _ => false
    }
    assert(broadcasts >= 2, s"expected ≥2 broadcast joins, got $broadcasts")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("q08 temporal join: daily dimension is a broadcast hash join") {
    val nodes = executedAll(SparkEntry.queries("q08_temporal_join")(spark, sf0_001))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "daily dim must broadcast, not shuffle the fact side")
  }

  test("q04 filter battery: predicates are pushed into the parquet scan") {
    val nodes = executedAll(SparkEntry.queries("q04_filter_battery")(spark, sf0_001))
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_ != "[]")),
      s"no pushed filters in: ${scans.map(_.metadata.get("PushedFilters"))}")
  }

  test("LSH candidate generation (x02, x03) never plans a cartesian product") {
    Seq("x02_minhash_lsh", "x03_simhash").foreach { q =>
      val nodes = executedAll(SparkEntry.queries(q)(spark, sf0_001))
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        s"$q degenerated to a cartesian product")
    }
  }

  test("AQE OptimizeSkewedJoin fires on the q27 shape without manual salting") {
    // q27's manual salt is the portable lever; this pins the AUTOMATIC path
    // the 100× story also leans on: a hot-key sort-merge join re-planned at
    // runtime into a skew join (SortMergeJoin ... skew=true), with the hot
    // partition split by map-output size. Thresholds are scaled down so the
    // test fixture's hot key (90% of rows on one event_type analog) crosses
    // the same size triggers a 100 TB hot key crosses in production.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val facts = s2.range(0, 60000).select(
      when(col("id") % 20 === 0, (col("id") % 4) + 1).otherwise(lit(0L)).as("k"),
      col("id").as("v"),
      lpad(col("id").cast("string"), 64, "x").as("pad")) // row weight → real bytes
    val dim = s2.range(0, 5).select(col("id").as("k"), (col("id") * 10).as("dv"))
    val joined = facts.join(dim, "k").select(col("k"), col("v"), col("dv"))
    val nodes = PlanWalk.executedAll(joined)
    val smjs = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join in ${nodes.map(_.getClass.getSimpleName)}")
    assert(smjs.exists(_.isSkewJoin),
      "AQE must re-plan the hot partition as a skew join (skew=true)")
  }

  test("q55 refresh delta scan partition-prunes to the new days only") {
    // the incremental-maintenance claim: refresh cost ∝ new data. The
    // day-partitioned fact scan under the delta filter must carry a
    // partition filter and read strictly fewer partitions than exist.
    val delta = spark.read.parquet(
        graft.operators.Matview.factPath(spark, sf0_001))
      .filter(col("day") > lit("2024-01-25").cast("date"))
    val nodes = executedAll(delta)
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "delta filter must prune day partitions, not scan-and-filter")
    val read = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    val all = scan.relation.location.listFiles(Nil, Nil).length
    assert(read < all, s"expected pruning: read $read of $all partitions")
  }

  test("runtime bloom-filter pruning fires on a selective-dim shuffle join") {
    // The automatic semi-join reduction the 100 TB story leans on when a
    // dim is too big to broadcast: Catalyst's InjectRuntimeFilter builds a
    // bloom filter from the selective (filtered) side and applies
    // might_contain on the fact side BEFORE the shuffle — rows that can't
    // join never leave the scan stage. Thresholds scaled down so the
    // fixture-sized join crosses the same triggers production sizes cross.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val fact = Tables.table(s2, sf0_001, "lineitem")
    val dim = Tables.table(s2, sf0_001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_totalprice"))
    assert(j.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "expected an injected bloom-filter runtime filter on the fact side")
    assert(j.count() > 0)
  }

  test("q58 interval join: bucket equi-join, no cartesian / nested-loop") {
    // The whole point of the bucket rewrite: a pure range predicate would
    // plan BroadcastNestedLoopJoin (or cartesian); bucketing turns it into
    // an equi-join the engine can shuffle-partition. The range check rides
    // along as the equi-join's post-condition, not a join strategy.
    val nodes = executedAll(SparkEntry.queries("q58_interval_join")(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "interval join degenerated to a cartesian product")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "interval join degenerated to a nested-loop join")
    val equi = nodes.exists {
      case _: SortMergeJoinExec | _: BroadcastHashJoinExec => true
      case n => n.getClass.getSimpleName.contains("ShuffledHashJoin")
    }
    assert(equi, s"expected an equi join on the bucket key in " +
      s"${nodes.map(_.getClass.getSimpleName)}")
  }

  test("q24 top-k is TakeOrdered (per-partition heap), not a global sort") {
    val nodes = executedAll(SparkEntry.queries("q24_topk")(spark, sf0_001))
    assert(nodes.exists(_.getClass.getSimpleName.startsWith("TakeOrderedAndProject")),
      s"expected TakeOrderedAndProject in ${nodes.map(_.getClass.getSimpleName)}")
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
      "global top-k must not shuffle")
  }

  test("x29 chunking shuffles only for the presentation sort") {
    // chunk emission itself is per-row column math (sequence + posexplode
    // + slice) — the ONLY exchange allowed is the final orderBy's range
    // partitioning; a hash exchange would mean the operator aggregated or
    // joined somewhere it shouldn't
    val nodes = executedAll(SparkEntry.queries("x29_chunk")(spark, sf0_001))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 1,
      s"chunking must not shuffle beyond the output sort, got ${shuffles.size}")
    assert(!nodes.exists(n => n.getClass.getSimpleName.contains("HashAggregate")),
      "chunking has no aggregation")
  }

  test("x31 vocab top-K is TakeOrdered over the count table, not a global sort") {
    val nodes = executedAll(SparkEntry.queries("x31_vocab_build")(spark, sf0_001))
    assert(nodes.exists(_.getClass.getSimpleName.startsWith("TakeOrderedAndProject")),
      s"expected TakeOrderedAndProject in ${nodes.map(_.getClass.getSimpleName).distinct}")
  }

  test("x33 k-means: reads the persisted kmlists artifact; never plans a cartesian product") {
    // Since the x33/x34/x60 routing through the shared k-means inverted
    // file, x33's executed plan is an artifact scan — the k×corpus
    // broadcast assignment happens once at artifact-build time, not per
    // query. Pin the artifact scan (mirrors the x60 pin below) and keep
    // the no-cartesian ban.
    val nodes = executedAll(SparkEntry.queries("x33_kmeans")(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "k×corpus assignment must be a broadcast, not a cartesian")
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata.get("Location")
        .exists(_.contains("graft_kmlists"))),
      s"x33 must scan the persisted kmlists artifact, saw: " +
        scans.flatMap(_.metadata.get("Location")).mkString(", "))
  }

  test("q64 running distinct: ONE hash exchange serves both window specs") {
    // HashPartitioning(user) satisfies Clustered(user, event_type); the
    // explicit repartition means the (user, event_type) first-sighting
    // window and the user-keyed running sum share a single fact shuffle —
    // any hash exchange beyond it is a regression to shuffle-per-window
    val nodes = executedAll(SparkEntry.queries("q64_running_distinct")(spark, sf0_001))
    val hashShuffles = nodes.collect {
      case s: ShuffleExchangeLike
        if s.outputPartitioning.getClass.getSimpleName == "HashPartitioning" => s
    }
    assert(hashShuffles.size == 1,
      s"expected exactly 1 hash exchange, got ${hashShuffles.size}")
  }

  test("x42 heavy hitters: exact recount semi-joins a BROADCAST candidate set") {
    val nodes = executedAll(SparkEntry.queries("x42_heavy_hitters")(spark, sf0_001))
    assert(nodes.collect { case j: BroadcastHashJoinExec => j }
      .exists(_.joinType.toString == "LeftSemi"),
      "candidates must broadcast; the corpus is never shuffled for the join")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("q66 Q17 shape: per-part avg and join-back share one fact exchange") {
    val nodes = executedAll(SparkEntry.queries("q66_small_qty_revenue")(spark, sf0_001))
    val reused = nodes.exists(_.getClass.getSimpleName.contains("ReusedExchange"))
    // the part-type dim join is always one broadcast; the avg side only
    // counts as broadcast if a SECOND broadcast hash join appears (AQE
    // converting the self-join at tiny SF)
    val limsBroadcast = nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2
    assert(reused || limsBroadcast,
      "expected ReusedExchange on the self-join (or an AQE broadcast of the avg side)")
  }

  test("x55 bloom probe: bitset broadcast, per-gram path stays codegen'd") {
    val nodes = executedAll(SparkEntry.queries("x55_bloom_decon")(spark, sf0_001))
    // the 8 KB bitset reaches every probe task as a broadcast — never a
    // shuffled join side — and the bit test compiles into a codegen stage
    // (a UDF probe would appear as BatchEvalPython/Invoke outside WSCG)
    assert(nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) ||
      nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "bloom bitset must broadcast to the probe side")
    assert(nodes.exists(
      _.getClass.getSimpleName.startsWith("WholeStageCodegen")))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("x58 ADC: LUT broadcasts; the code scan never shuffles for the join") {
    val nodes = executedAll(SparkEntry.queries("x58_pq_adc")(spark, sf0_001))
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "the (sub, cluster) LUT join must broadcast")
    // the only fact-side hash exchanges are the (query, vec) partial
    // aggregate and the top-k window — never a join shuffle of the codes
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty, s"codes were shuffle-joined: $smj")
  }

  test("q86 IVM: the retraction delta joins customer via broadcast") {
    val nodes = executedAll(SparkEntry.queries("q86_join_ivm")(spark, sf0_001))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "delta-side customer join must broadcast (maintenance cost ∝ |Δ|)")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("x92 CDC chunking: native boundary expression keeps emission shuffle-free; only the fp window and output sort exchange") {
    val nodes = executedAll(SparkEntry.queries("x92_cdc_chunks")(spark, sf0_001))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"chunk emission is per-row; only the chunk_fp window + sort may exchange, got ${shuffles.size}")
    assert(!nodes.exists(n => n.getClass.getSimpleName.contains("HashAggregate")),
      "chunking aggregates nothing — the dup count is a window")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("x93 hashed scorer: the weight table probes via broadcast; the token stream never shuffle-joins") {
    val nodes = executedAll(SparkEntry.queries("x93_hashed_linear_score")(spark, sf0_001))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "512-bin weight probe must broadcast")
    assert(nodes.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "the token stream must not shuffle for the weight join")
  }

  test("x97 priority sample: top-20 is TakeOrdered, not a global sort") {
    val nodes = executedAll(SparkEntry.queries("x97_priority_sample")(spark, sf0_001))
    assert(nodes.exists(_.getClass.getSimpleName.startsWith("TakeOrderedAndProject")),
      s"expected TakeOrderedAndProject in ${nodes.map(_.getClass.getSimpleName).distinct}")
  }

  test("m12 aspect buckets: one metadata pass, the bucket rollup is the only hash exchange") {
    val nodes = executedAll(SparkEntry.queries("m12_aspect_buckets")(spark, sf0_001))
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 2,
      s"expected only the 3-group aggregate (+output sort), got ${shuffles.size} exchanges")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("x142 AUC: no pair materialization — every join is hash-based, never nested-loop or cartesian") {
    // the whole point of the rank-sum form is avoiding pos×neg pairs; a
    // BNLJ or cartesian anywhere means the collapse-to-values design broke
    val nodes = executedAll(SparkEntry.queries("x142_auc_rank")(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "pair-free AUC must not plan a nested-loop join")
  }

  test("x143/x144/x145 graph statistics: wedge joins and peels stay equi-join, never cartesian") {
    // collect each query's plan ONCE; both bans assert on the cached nodes
    val nodesByQ =
      Seq("x143_kcore", "x144_clustering_coeff", "x145_conductance")
        .map(q => q -> executedAll(SparkEntry.queries(q)(spark, sf0_001)))
    nodesByQ.foreach { case (q, nodes) =>
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        s"$q degenerated to a cartesian product")
    }
    // the peel/wedge probes themselves must stay keyed; x145 is exempt
    // from the BNLJ ban only for its one-row 2m anchor (the house
    // broadcast-of-scalar pattern), which x143/x144 don't need
    nodesByQ.filterNot(_._1 == "x145_conductance").foreach { case (q, nodes) =>
      assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        s"$q planned a nested-loop join — an edge/label probe lost its key")
    }
  }

  test("x53/x94/x35: no data-sized single-reducer rank window survives the r9 migration") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // Ranks.twoPassRank leaves exactly two window families: the local rank
    // partitioned by (group, bucket) — parallel across buckets — and the
    // offsets prefix sum partitioned by the (possibly empty) group alone
    // but fed by a groupBy-count, i.e. a BOUNDED aggregated table. So any
    // window at or below `thinSize` partition columns must have an
    // aggregate somewhere beneath it; a data-sized rank on a
    // low-cardinality key (r8's x53/x94) or a global ntile (r8's x35)
    // has none and fails here.
    def check(q: String, thinSize: Int): Unit = {
      val df = SparkEntry.queries(q)(spark, sf0_001)
      df.collect()
      val wins = collectAll(df.queryExecution.executedPlan)
        .collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$q expected window nodes")
      wins.filter(_.partitionSpec.size <= thinSize).foreach { w =>
        assert(collectAll(w.child).exists(_.isInstanceOf[BaseAggregateExec]),
          s"$q runs a window partitioned on ${w.partitionSpec} over " +
            "non-aggregated (data-sized) input")
      }
    }
    check("x53_class_balance", 1)  // [lang, bkt] local / [lang] offsets
    check("x94_mad_outliers", 1)   // [event_type, bkt] / [event_type]
    check("x35_ppl_buckets", 0)    // [bkt] local / [] offsets
  }

  test("graph builders: the doc_id < 400 cap reaches the parquet scan as a pushed filter") {
    // every synthetic graph derives from a 400-doc slice; if the cap
    // stops pushing, a 100 TB documents table would be fully scanned
    // just to build a 98-node fixture graph. The builders localCheckpoint
    // (so query plans start at the checkpoint scan); the pin runs on the
    // shared un-checkpointed edge source they all derive from.
    val scans = executedAll(operators.Corpus.ccRawEdges(spark, sf0_001))
      .collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(p => p.contains("LessThan(doc_id,400"))),
      s"doc_id cap not pushed — " +
        scans.map(_.metadata.get("PushedFilters")).mkString(", "))
  }

  test("x195 as-of enrichment: union + carry-forward window, never a ts-range nested-loop join") {
    // the J5/q12 as-of discipline: a [valid_from, valid_to) range
    // predicate planned as a join would be a BNLJ/cartesian (every probe
    // against every dimension version); the carry-forward shape keeps it
    // one user-keyed shuffle
    val nodes =
      executedAll(SparkEntry.queries("x195_scd2_pointintime")(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "as-of must not plan a nested-loop range join")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "as-of must not plan a cartesian")
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]) &&
      !nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the carry-forward shape has no join at all — a join here means " +
        "the union pattern regressed to probe×dimension")
  }

  test("m22 cross-modal: banded equi-join over persisted fingerprint artifacts — no cartesian, no text×clips") {
    val nodes =
      executedAll(SparkEntry.queries("m22_crossmodal_neardup")(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "cross-tier candidates must come from the band-value equi-join")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "no nested-loop pair scan across tiers")
    val locs = nodes.collect { case f: FileSourceScanExec => f }
      .flatMap(_.metadata.get("Location"))
    assert(locs.exists(_.contains("graft_psimhash")),
      s"text tier must read x63's persisted psimhash artifact, saw: $locs")
    assert(locs.exists(_.contains("graft_capsimhash")),
      s"caption tier must read its persisted capsimhash artifact, saw: $locs")
  }

  test("x196/x197: the tokenizer model is served from persisted artifacts, never retrained per query") {
    val m = executedAll(SparkEntry.queries("x196_bpe_merges")(spark, sf0_001))
    val mLocs = m.collect { case f: FileSourceScanExec => f }
      .flatMap(_.metadata.get("Location"))
    assert(mLocs.exists(_.contains("graft_bpemerges")),
      s"x196 must scan the persisted merge-rule artifact, saw: $mLocs")
    assert(!mLocs.exists(_.contains("documents.parquet")),
      "a corpus scan in x196's serving plan means training ran inline")
    val e = executedAll(SparkEntry.queries("x197_bpe_fertility")(spark, sf0_001))
    val eLocs = e.collect { case f: FileSourceScanExec => f }
      .flatMap(_.metadata.get("Location"))
    assert(eLocs.exists(_.contains("graft_bpesyms")),
      s"x197 must scan the persisted symbol-table artifact, saw: $eLocs")
  }

  test("x204: the trained classifier is served from the persisted qweights artifact, never retrained per query") {
    val nodes = executedAll(SparkEntry.queries("x204_quality_classifier")(spark, sf0_001))
    val locs = nodes.collect { case f: FileSourceScanExec => f }
      .flatMap(_.metadata.get("Location"))
    assert(locs.exists(_.contains("graft_qweights")),
      s"x204 must scan the persisted trained-weight artifact, saw: $locs")
    assert(!locs.exists(_.contains("documents.parquet")),
      "a corpus scan in x204's serving plan means training ran inline")
  }

  test("x60 IVF-PQ: coarse lists come from the persisted inverted-file artifact, not a fresh assignment pass") {
    // r9's regression: x60 re-ran the corpus×centroid assignment inline
    // (crossJoin + rank window over every vector) instead of scanning the
    // kmlists artifact x33/x34 share — at 100 TB that is re-clustering
    // the corpus per query. The plan must read the artifact, and the only
    // embeddings scans left are the vec_id<3 query-vector reads.
    val nodes = executedAll(SparkEntry.queries("x60_ivf_pq")(spark, sf0_001))
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata.get("Location")
        .exists(_.contains("graft_kmlists"))),
      s"x60 must scan the persisted kmlists inverted file, saw: " +
        scans.flatMap(_.metadata.get("Location")).mkString(", "))
    scans.filter(_.metadata.get("Location")
        .exists(_.contains("embeddings.parquet"))).foreach { f =>
      assert(f.metadata.get("PushedFilters")
          .exists(_.contains("LessThan(vec_id,3)")),
        s"corpus-sized embeddings scan crept back into x60: " +
          s"${f.metadata.get("PushedFilters")}")
    }
  }

  test("x155 MMR: candidate retrieval runs through the native TopKPerGroup (no per-query global sort)") {
    // the entry localCheckpoints the candidate table (hiding its plan),
    // so the pin runs on the exposed un-checkpointed stage it derives from
    val nodes = executedAll(operators.Similarity.mmrCandidates(spark, sf0_001))
    assert(nodes.exists(_.getClass.getSimpleName.startsWith("TopKPerGroupExec")),
      "the corpus-touching candidate stage must be the bounded-heap operator")
  }

  test("x156/x165 drift grid: the documents scan prunes to (source, n_chars) — text never read") {
    // x165 localCheckpoints the grid (hiding its scan from the final
    // plan), so both queries pin on the shared un-checkpointed builder
    val scans = executedAll(operators.Analytics.lengthEcdfGrid(spark, sf0_001))
      .collect { case f: FileSourceScanExec => f }
      .filter(_.metadata.get("Location").exists(_.contains("documents")))
    assert(scans.nonEmpty, "the grid reads documents")
    scans.foreach { f =>
      val rs = f.metadata.getOrElse("ReadSchema", "")
      assert(!rs.contains("text"), s"grid scan must not read the body: $rs")
    }
  }

  test("rank-limit windows get Spark's native WindowGroupLimit pushdown (per-partition top-k before the sort)") {
    // x05's row_number ≤ 5 filter should trigger InferWindowGroupLimit —
    // the optimizer-owned equivalent of the TopKPerGroup operator; this
    // pin notices if a future query rewrite silently loses it
    val nodes = executedAll(SparkEntry.queries("x05_cosine_topk")(spark, sf0_001))
    assert(nodes.exists(_.getClass.getSimpleName.startsWith("WindowGroupLimit")),
      s"expected WindowGroupLimitExec in: ${nodes.map(_.getClass.getSimpleName).distinct}")
  }

  test("x163 coverage greedy: a round is broadcast anti-joins + TakeOrdered argmax — no sort-merge join") {
    // the entry localCheckpoints every pick (hiding round plans), so the
    // pin runs one exposed un-checkpointed round on a crafted 1-pick state
    val gd = operators.Dedup.coverageGrams(spark, sf0_001)
    val picked = gd.select(col("doc_id")).distinct()
      .orderBy(col("doc_id")).limit(1)
    val covered = gd.join(broadcast(picked), "doc_id")
      .select(col("g")).distinct()
    val nodes = executedAll(
      operators.Dedup.coverageRound(gd, Some((covered, picked))))
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "covered/picked state must stay broadcast-sized, never shuffled-merged")
    assert(nodes.exists(_.getClass.getSimpleName.startsWith("TakeOrderedAndProject")),
      "the argmax must be the bounded-heap TakeOrderedAndProject")
  }

  test("x169 PII scan: exchanges carry only the types-sized report — the regex pass is scan-side column math") {
    val nodes = executedAll(SparkEntry.queries("x169_pii_scan")(spark, sf0_001))
    val exchanges = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    // one hash exchange for the per-type aggregate + one range exchange
    // for the 5-row presentation sort; anything more means the regex
    // stage stopped being pure column math
    assert(exchanges == 2,
      s"expected agg + presentation exchanges only, got $exchanges")
  }

  test("x148 two-hop recs: candidate pruning runs through the native TopKPerGroup, never a cartesian") {
    val nodes = executedAll(SparkEntry.queries("x148_two_hop_recs")(spark, sf0_001))
    assert(nodes.exists(_.getClass.getSimpleName.startsWith("TopKPerGroupExec")),
      s"expected TopKPerGroupExec in ${nodes.map(_.getClass.getSimpleName).distinct}")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("x180 QQ drift: the decile-selection stage plans ZERO window operators and no cartesian") {
    // the query's claim: exact deciles as filtered-min rank selection —
    // the serving-path quantile shape. The shared grid's per-source cum
    // window executes behind the localCheckpoint; the stage inspected
    // here (everything after the grid) must be window-free, so a
    // WindowExec means the selection regressed to a sort-based rank.
    import org.apache.spark.sql.execution.window.WindowExec
    val nodes = executedAll(SparkEntry.queries("x180_qq_drift")(spark, sf0_001))
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      "x180's selection must not plan a window — deciles are filtered-min")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }
}
