package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main behind SCALING.md's st22 ↔ st37 crossover table
  * (VERDICT r15 item 4): derive large position graphs FROM the testdata
  * corpus (the x230 derived-corpus discipline applied to graphs — no
  * synthesized rows), seed a many-component label state, then drive
  * SMALL bridge-edge micro-batches through BOTH production folds —
  * [[Streams.singleStoreCcBatch]] (st22: full label read per batch) and
  * [[Streams.frontierCcBatch]] (st37: pruned two-store read) — and print
  * one JSON line per (scale, fold) with per-batch seconds. The question
  * it answers: at what state size does st22's nodes-sized per-batch read
  * overtake st37's two-store fixed overhead?
  *
  * Derivation: token positions (doc_id, i) of the ingest token table
  * become node ids doc_id·2²⁰ + i; documents are taken in/out WHOLE via
  * a hash-mod selector (sel_mod), so intra-doc edges stay valid at every
  * scale. Seed edges pair consecutive positions (even i → i+1): ~half
  * the selected tokens become 2-node components. Delta batches bridge
  * (i → i+2) at the first few positions in (doc_id, i) order — 4 edges
  * per batch, the realistic small-Δ maintenance shape, and few enough
  * endpoints that most of the [[StateScale.KeyedParts]] partitions stay
  * untouched (at 16 fixture partitions a large batch touches them all
  * and the prune has nothing to prune — the granularity caveat recorded
  * with the results).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *      runMain graft.streaming.CcScaleBench
  */
object CcScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8") // the streaming-fold conf
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // two derived position universes: corpus token positions (doc_id, i)
    // and lineitem line positions (l_orderkey, l_linenumber) — the
    // latter is the testdata's largest table (6×10⁵ positions at sf0.1)
    def tokPos(m: Long) = graft.operators.Tokens.table(spark, sfDir)
      .filter(pmod(xxhash64(col("doc_id")), lit(m)) === 0)
      .select((col("doc_id") * 1048576L + col("i")).as("pid"),
        col("doc_id").as("g"), col("i").cast("long").as("i"))
    def liPos(m: Long) = graft.Tables.lineitem(spark, sfDir)
      .filter(pmod(xxhash64(col("l_orderkey")), lit(m)) === 0)
      .select((col("l_orderkey") * 8L + col("l_linenumber")).as("pid"),
        col("l_orderkey").as("g"), col("l_linenumber").cast("long").as("i"))
    val tiers: Seq[(String, Long, DataFrame)] =
      Seq(32L, 8L, 2L).map(m => ("tok", m, tokPos(m))) ++
        Seq(4L, 1L).map(m => ("li", m, liPos(m)))

    for ((src, m, pos0) <- tiers) {
      val pos = pos0.localCheckpoint()
      val even = pos.filter(col("i") % 2 === 0)
      val seed = even.as("a").join(pos.as("b"),
          col("a.g") === col("b.g") && col("b.i") === col("a.i") + 1)
        .select(col("a.pid").as("src"), col("b.pid").as("dst"))
        .localCheckpoint()
      val nSeed = seed.count()
      // 12 deterministic bridge edges (i → i+2) in (g, i) order,
      // replayed as 3 batches of 4 — identical across both folds
      val bridges = even.as("a").join(pos.as("b"),
          col("a.g") === col("b.g") && col("b.i") === col("a.i") + 2)
        .select(col("a.pid").as("src"), col("b.pid").as("dst"),
          col("a.g").as("gg"), col("a.i").as("ii"))
        .orderBy(col("gg"), col("ii")).limit(12)
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      for (impl <- Seq("st22", "st37")) {
        val tag = s"ccsb_${impl}_${src}_$m"
        val lab = graft.Scratch.path(tag + "_lab")
        val mem = graft.Scratch.path(tag + "_mem")
        def fold(b: DataFrame): Unit =
          if (impl == "st22") Streams.singleStoreCcBatch(b, lab)
          else Streams.frontierCcBatch(b, lab, mem)
        val seedS = time(fold(seed))
        val stateRows = spark.read.parquet(lab).count()
        val deltaS = bridges.grouped(4).toSeq
          .map(g => time(fold(g.toDF("src", "dst"))))
        println(s"""{"bench":"cc_crossover","impl":"$impl","src":"$src",""" +
          s""""sel_mod":$m,"state_nodes":$stateRows,"seed_edges":$nSeed,""" +
          s""""seed_s":${f"$seedS%.2f"},""" +
          s""""delta_s":[${deltaS.map(d => f"$d%.3f").mkString(",")}]}""")
      }
    }
    spark.stop()
  }
}
