package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O(Δ) state maintenance for the Δ-maintained streaming families
  * (VERDICT r12 item 1). The r12 fold shape —
  * `prior.unionByName(delta).write.mode("overwrite")` — rewrote the ENTIRE
  * state parquet every micro-batch: O(state) I/O per batch, quadratic over
  * the stream's life, the one scale-killer left after the candidate plans
  * went banded/bucketed. Here state is a DELTA LOG: each micro-batch
  * APPENDS only its own delta as new part-files (batch k never touches
  * batch k−1's files — pinned in Round13Spec via the [[events]] journal),
  * and the fold's merge function moves to (a) READ time, where it runs
  * over the bounded log, and (b) a COMPACTION that triggers on file
  * count, merging the log back to one generation with the write-then-swap
  * rule (the reader-visible dir stays intact until the merged replacement
  * is fully written).
  *
  * Legality: a fold may move to read time exactly when it is a merge of
  * per-batch deltas under an associative + commutative (for sums/mins/
  * maxes) or idempotent (for set unions) operator — the same mergeability
  * arguments each family's header already makes for its overwrite fold.
  * Purely-additive families (per-doc metadata, feature cells) use the
  * identity merge: the log IS the state. Families whose fold MUTATES
  * prior rows (st22's CC relabel, st29's open-run extension, st02's
  * keep-latest fact) keep the rewrite — their per-batch write is
  * inherently O(touched state), and on a cluster they live in a keyed
  * store (Delta MERGE / state backend), not a rewritten file.
  *
  * Scale: per-batch I/O is O(delta); read amplification is bounded by
  * `maxFiles` × the compacted generation; compaction itself is O(state)
  * but amortized — it runs once per `maxFiles` appends, so the per-batch
  * amortized cost is O(state / maxFiles), tunable against read fan-in.
  * This is the LSM contract every production state store (RocksDB behind
  * Structured Streaming, Delta's OPTIMIZE) implements.
  */
private[graft] object StateFold {

  /** Journal entry for one log mutation — the Round13Spec pin inspects
    * these to prove appends never touch prior files. `before`/`after`
    * are the dir's data part-file names (markers excluded). */
  final case class FoldEvent(dir: String, kind: String,
      before: Set[String], after: Set[String])

  private val journal =
    new java.util.concurrent.ConcurrentLinkedQueue[FoldEvent]()

  /** Journal retention: a long-lived streaming JVM appends forever, so
    * the observability journal is a ring — oldest events evict past this
    * bound. Far above any test's event volume (the Round13Spec pins
    * snapshot-and-slice within one run), so eviction never skews a pin. */
  private val MaxJournal = 8192

  private def record(e: FoldEvent): Unit = {
    journal.add(e)
    while (journal.size > MaxJournal) journal.poll()
  }

  private[graft] def events: Seq[FoldEvent] = {
    import scala.jdk.CollectionConverters._
    journal.iterator().asScala.toSeq
  }

  /** Data part-files (not markers) currently in the log dir. */
  private[graft] def partFiles(dir: String): Set[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Set.empty
    else {
      val l = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
      } finally l.close()
    }
  }

  /** Append `delta` to the log as NEW part-files. Prior generations are
    * never read, rewritten, or deleted — O(delta) I/O by construction. */
  def append(delta: DataFrame, dir: String): Unit = {
    val before = partFiles(dir)
    delta.write.mode("append").parquet(dir)
    record(FoldEvent(dir, "append", before, partFiles(dir)))
  }

  /** Read the full log (merge-at-read is the caller's `merge`);
    * `fallback.limit(0)` when the log has no data files yet — the
    * first-batch case every foreachBatch prior-read hits. */
  def readOr(ss: SparkSession, dir: String, fallback: => DataFrame): DataFrame =
    if (partFiles(dir).nonEmpty) ss.read.parquet(dir) else fallback.limit(0)

  /** Compact the log when it exceeds `maxFiles` part-files: run `merge`
    * over the whole log into a sibling temp dir, then swap (the reader-
    * visible dir is replaced only after the merged generation is fully
    * written — st09's write-then-swap rule). Amortized O(state/maxFiles)
    * per batch. */
  def maybeCompact(ss: SparkSession, dir: String, maxFiles: Int = 32)(
      merge: DataFrame => DataFrame): Unit = {
    val before = partFiles(dir)
    if (before.size > maxFiles) {
      val tmp = dir + ".compact"
      // the compacted generation must be materially SMALLER in file
      // count than the trigger threshold, or compaction churns without
      // buying read fan-in; at cluster scale this coalesce factor is
      // the compaction output partitioning (sized to state, not delta)
      merge(ss.read.parquet(dir)).coalesce(math.max(1, maxFiles / 4))
        .write.mode("overwrite").parquet(tmp)
      graft.Publish.deleteTree(Paths.get(dir))
      Files.move(Paths.get(tmp), Paths.get(dir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      record(FoldEvent(dir, "compact", before, partFiles(dir)))
    }
  }
}
