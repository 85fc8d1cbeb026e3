package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.QueryDef

/** Retention sweep for the content-keyed artifact warehouse (VERDICT r11
  * item 2) — the VACUUM every production artifact store has. The warehouse
  * accumulates superseded generations forever: every source regeneration
  * changes the content key, and every `codeVersion`/`builderVersion` bump
  * strands the previous directory. This operator builds the LIVE manifest
  * (registered builder families × live data roots × current content keys),
  * classifies every warehouse entry against it, and plans — or, via
  * [[vacuum]], performs — orphan deletion.
  *
  * Safety invariants (pinned in Round12Spec):
  *   - a LIVE artifact (current version, current key of ANY live root) is
  *     NEVER in the delete set;
  *   - a superseded generation (stale version stem, or current version
  *     with a key no live root produces) ALWAYS is;
  *   - entries matching no registered family are UNKNOWN and never touched
  *     (delete only what you can prove you own);
  *   - live scratch (this JVM's run token) and in-flight `.build-` temps
  *     are kept unless `sweepScratch` explicitly opts in to dead-JVM
  *     cleanup.
  *
  * Scale: this is a metadata operator — one warehouse listing (at cluster
  * scale, the table-format manifest / metastore listing, not a filesystem
  * walk) against a registry that is code, and per-root content keys that
  * are file-stat digests. Nothing here touches data files except the
  * deletes themselves.
  */
object ArtifactVacuum {

  /** One build-once artifact family: `stem` is the name prefix shared by
    * ALL generations (up to but excluding the version tail), `prefix` the
    * current-version prefix that a live key completes. An entry matching
    * `stem` but not `prefix` is a stale VERSION; matching `prefix` with a
    * non-live key is stale CONTENT. */
  final case class Family(name: String, srcTable: String,
      stem: String, prefix: String)

  /** The [[DerivedTable]]-managed families as (tag, srcTable,
    * builderVersion) — Round12Spec's lint parses every DerivedTable call
    * site in main source and asserts THIS table matches exactly, so a new
    * builder cannot land without vacuum coverage. */
  private[graft] val derivedSpecs: Seq[(String, String, Int)] = Seq(
    ("jlproj", "embeddings", 1),
    ("ivf4", "embeddings", 2),
    ("kmlists", "embeddings", 1),
    ("kmeans", "embeddings", 1),
    ("pqbook", "embeddings", 1),
    ("ivf", "embeddings", 2),
    ("pqcodes", "embeddings", 1),
    ("lsh", "embeddings", 1),
    ("fptable", "documents", 1),
    ("langprof", "documents", 1),
    ("traingrams", "documents", 1),
    ("shingles", "documents", 1),
    ("pminhash", "documents", 1),
    ("psimhash", "documents", 1),
    ("winnow", "documents", 1),
    ("dupclusters", "documents", 1),
    ("minhash", "documents", 1),
    ("simhash", "documents", 1),
    ("ppjprefix", "documents", 1),
    ("bigramlm_uni", "documents", 1),
    ("bigramlm_top", "documents", 1),
    ("bpemerges", "documents", 2),
    ("qweights", "documents", 2),
    ("qweightstr", "documents", 1),
    ("qvalcurve", "documents", 1),
    ("qweightsval", "documents", 1),
    ("bpesyms", "documents", 2),
    ("bpemerge1", "documents", 1),
    ("bpemerge2", "documents", 1),
    ("bpeseg", "documents", 1),
    ("bloombits", "documents", 1),
    ("aggmv", "events", 1),
    ("aggmv_stale", "events", 1),
    ("tokens", "documents", 1),
    ("slcp", "documents", 2),
    ("rwslcp", "documents", 1),
    ("wfslcp", "documents", 2),
    ("capsimhash", "documents", 1),
    ("lplabels", "documents", 1),
    ("geopoints", "events", 1))

  /** The full registry of build-once families. A Round12Spec lint parses
    * every `DerivedTable(...)` call site and every `Warehouse.path`
    * literal in main source and fails when a builder is missing here —
    * the registry cannot silently drift from the code. */
  val families: Seq[Family] = derivedSpecs.map { case (tag, src, bv) =>
    Family(tag, src, s"graft_${tag}_", DerivedTable.livePrefix(tag, bv))
  } ++ Seq(
    // direct Warehouse builders
    Family("fact", "events", "graft_fact_", "graft_fact_v2_"),
    Family("events_zorder", "events",
      "graft_events_zorder_", "graft_events_zorder_v1_"),
    Family("events_byday", "events",
      "graft_events_byday_", "graft_events_byday_v2_"),
    Family("events_frag", "events",
      "graft_events_frag_", "graft_events_frag_v1_"),
    Family("events_compact", "events",
      "graft_events_compact_", "graft_events_compact_v1_"),
    Family("time_travel", "events", "graft_tt_", "graft_tt_v1_"),
    Family("csv_sink", "events", "graft_csv_", "graft_csv_v2_"),
    Family("jsonl_sink", "documents", "graft_jsonl_", "graft_jsonl_v2_"),
    Family("orc_sink", "documents", "graft_orc_", "graft_orc_v1_"),
    Family("dynamic_overwrite", "events",
      "graft_dynover_", "graft_dynover_v1_"),
    Family("schema_evolution", "documents",
      "graft_schemaevo_", "graft_schemaevo_v1_"),
    Family("gdpr_rewrite", "events", "graft_gdpr_", "graft_gdpr_v1_"),
    Family("bucketed_stats", "events", "g_user_stats_", "g_user_stats_v2_"),
    Family("bucketed_purch", "events", "g_user_purch_", "g_user_purch_v2_"),
    // stream staging (build-once micro-batch layouts)
    Family("stage_events", "events", "graft_stream_v", "graft_stream_v2_"),
    Family("stage_events_dup", "events",
      "graft_stream_dup_", "graft_stream_dup_v1_"),
    Family("stage_events_split", "events",
      "graft_stream_split_", "graft_stream_split_v1_"),
    Family("stage_events_tsplit", "events",
      "graft_stream_tsplit_", "graft_stream_tsplit_v1_"),
    Family("stage_docs_split", "documents",
      "graft_stream_docsplit_", "graft_stream_docsplit_v1_"),
    Family("stage_orders_split", "orders",
      "graft_stream_ordsplit_", "graft_stream_ordsplit_v1_"),
    Family("stage_part_split", "part",
      "graft_stream_partsplit_", "graft_stream_partsplit_v1_"),
    Family("stage_vec_split", "embeddings",
      "graft_stream_vecsplit_", "graft_stream_vecsplit_v1_"),
    Family("stage_cc_split", "documents",
      "graft_stream_ccsplit_", "graft_stream_ccsplit_v1_"))

  /** The data roots whose artifacts are LIVE: the queried root plus every
    * sibling directory that holds ANY registered source table (the local
    * analog of the production lease set — every SF dir the warehouse
    * currently serves). Detection by any registered table, not
    * documents.parquet alone (ADVICE r12): a sibling root carrying only
    * e.g. events.parquet still leases its events-derived artifacts. */
  def liveRoots(dir: String): Seq[Path] = {
    val d = Paths.get(dir).toAbsolutePath
    val srcTables = families.map(_.srcTable).distinct
    val sibs =
      if (d.getParent != null && Files.isDirectory(d.getParent)) {
        val l = Files.list(d.getParent)
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala.filter(p => Files.isDirectory(p) &&
            srcTables.exists(t => Files.exists(p.resolve(s"$t.parquet"))))
            .toSeq
        } finally l.close()
      } else Nil
    (d +: sibs).distinct.sortBy(_.toString)
  }

  /** Current content key of (root, srcTable), or None when the root lacks
    * that table (no live name to protect, none to compute). */
  private def keyOf(root: Path, srcTable: String): Option[String] = {
    val f = root.resolve(s"$srcTable.parquet")
    if (Files.exists(f)) Some(graft.ContentKey.key(f)) else None
  }

  /** Every live artifact name for the given roots. */
  def liveNames(roots: Seq[Path]): Map[String, Family] =
    (for {
      f <- families
      r <- roots
      k <- keyOf(r, f.srcTable)
    } yield (f.prefix + k) -> f).toMap

  /** Classify every top-level warehouse entry. Classes: live,
    * stale_version, stale_content, scratch_live, scratch_stale,
    * temp_orphan, unknown. */
  def classify(warehouseRoot: String,
      roots: Seq[Path]): Seq[(String, String, String)] = {
    val live = liveNames(roots)
    val byStem = families.sortBy(-_.stem.length) // longest stem wins
    val entries = {
      val l = Files.list(Paths.get(warehouseRoot))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString).toSeq
      } finally l.close()
    }
    entries.sorted.map { name =>
      val cls =
        if (name == s"graft_scratch_r${graft.Publish.runToken}")
          ("scratch_live", "scratch")
        else if (name.startsWith("graft_scratch_r"))
          ("scratch_stale", "scratch")
        else if (name.contains(".build-")) ("temp_orphan", "build_temp")
        else live.get(name) match {
          case Some(f) => ("live", f.name)
          case None => byStem.find(f => name.startsWith(f.stem)) match {
            case Some(f) if name.startsWith(f.prefix) =>
              ("stale_content", f.name)
            case Some(f) => ("stale_version", f.name)
            case None => ("unknown", "")
          }
        }
      (name, cls._1, cls._2)
    }
  }

  /** Perform the sweep: delete stale generations (and, with
    * `sweepScratch`, dead-JVM scratch and orphaned build temps — only
    * safe when no other builder JVM can be live, e.g. the sequential
    * verify protocol or a quiesced cluster). Returns deleted names. */
  def vacuum(warehouseRoot: String, roots: Seq[Path],
      sweepScratch: Boolean = false): Seq[String] = {
    val doomed = classify(warehouseRoot, roots).filter { case (_, c, _) =>
      c == "stale_version" || c == "stale_content" ||
        (sweepScratch && (c == "scratch_stale" || c == "temp_orphan"))
    }
    doomed.foreach { case (name, _, _) =>
      graft.Publish.deleteTree(Paths.get(warehouseRoot, name))
    }
    doomed.map(_._1)
  }

  private val manifestSchema = StructType(Seq(
    StructField("family", StringType, nullable = false),
    StructField("src_table", StringType, nullable = false),
    StructField("root", StringType, nullable = false),
    StructField("live_dir", StringType, nullable = false),
    StructField("is_built", BooleanType, nullable = false),
    StructField("n_stale_version", LongType, nullable = false),
    StructField("n_stale_content", LongType, nullable = false),
    StructField("age_days", LongType, nullable = true)))

  /** The live-artifact manifest against the real warehouse: one row per
    * (family × live root that carries the family's source table), with
    * build state and the family's stale-generation counts — plus one row
    * per UNKNOWN warehouse entry (family = "unknown", live_dir = the
    * entry) carrying its mtime age in days: the sweep never deletes what
    * it cannot prove it owns, so the manifest must at least SURFACE what
    * accumulates under that refusal (VERDICT r12 item 8). Driver-side by
    * design (a catalog/metadata listing, bounded by |families|×|roots| +
    * |unknown entries|). */
  def manifest(s: SparkSession, dir: String): DataFrame = {
    val roots = liveRoots(dir)
    val cls = classify(graft.Warehouse.root, roots)
    val byFam = cls
      .groupBy(_._3).map { case (f, es) =>
        f -> (es.count(_._2 == "stale_version").toLong,
          es.count(_._2 == "stale_content").toLong)
      }
    val rows = for {
      f <- families
      r <- roots
      k <- keyOf(r, f.srcTable)
    } yield {
      val liveDir = f.prefix + k
      val (sv, sc) = byFam.getOrElse(f.name, (0L, 0L))
      Row(f.name, f.srcTable, r.getFileName.toString, liveDir,
        Files.exists(Paths.get(graft.Warehouse.path(liveDir))), sv, sc, null)
    }
    val now = System.currentTimeMillis()
    val unknownRows = cls.filter(_._2 == "unknown").map { case (name, _, _) =>
      val p = Paths.get(graft.Warehouse.root, name)
      val age =
        if (Files.exists(p))
          (now - Files.getLastModifiedTime(p).toMillis) / 86400000L
        else 0L
      Row("unknown", "", "", name, true, 0L, 0L, Long.box(age))
    }
    import scala.jdk.CollectionConverters._
    s.createDataFrame((rows ++ unknownRows).asJava, manifestSchema)
      .orderBy(org.apache.spark.sql.functions.col("family"),
        org.apache.spark.sql.functions.col("root"),
        org.apache.spark.sql.functions.col("live_dir"))
  }

  val entries: Seq[QueryDef] = Seq(
    // The retention sweep's PLAN as a query: the live manifest every
    // registered builder family must appear in, with stale-generation
    // counts. Driver-checked rows-only (the manifest reflects warehouse
    // filesystem state no SQL oracle can see); the delete-set safety
    // properties are pinned in Round12Spec against a synthetic warehouse.
    // Actual deletion runs via [[vacuum]] under an explicit opt-in
    // (SPARK_GRAFT_VACUUM=1), never implicitly during a query.
    QueryDef.noOracle("w11_artifact_vacuum") { (s, d) =>
      if (sys.env.get("SPARK_GRAFT_VACUUM").contains("1"))
        vacuum(graft.Warehouse.root, liveRoots(d))
      manifest(s, d)
    })
}
