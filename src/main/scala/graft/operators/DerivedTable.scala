package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-keyed persisted derived tables — the ingest-time artifacts of a
  * production pipeline (matviews, ANN indexes, dedup signature tables,
  * trained profiles). Built once per source CONTENT (same invalidation
  * contract as [[Matview.factPath]]: the key covers size+mtime, so a
  * regenerated source rebuilds instead of serving stale data), then read
  * back as plain parquet. Only input-side structures are persisted this
  * way — never query results.
  */
object DerivedTable {

  /** Global schema epoch — bump only for changes that touch EVERY builder
    * (e.g. the key format itself). Per-builder logic changes bump the
    * caller's `builderVersion` instead (ADVICE r05), so invalidation is
    * local: editing the k-means updater can't serve stale centroids, and
    * bumping it doesn't throw away every other derived table. The cache
    * key covers source content but cannot see code — without a version a
    * warehouse dir from an older build would be served verbatim. */
  private val codeVersion = 3 // v3: langprof gained the top-K cap

  def apply(s: SparkSession, srcDir: String, srcTable: String, tag: String,
      partCols: Seq[String] = Nil, builderVersion: Int = 1)
      (build: => DataFrame): DataFrame = {
    val key = graft.ContentKey.key(
      java.nio.file.Paths.get(srcDir, s"$srcTable.parquet"))
    val out = graft.Warehouse.path(
      s"graft_${tag}_v${codeVersion}_b${builderVersion}_$key")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      val w = build.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(out)
    }
    s.read.parquet(out)
  }
}
