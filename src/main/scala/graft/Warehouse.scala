package graft

/** Root directory for every persisted derived artifact: the fact matview,
  * partitioned/bucketed layouts, ANN/LSH indexes, dedup signature tables,
  * the trained langid profile, stream staging and sink roundtrips.
  *
  * Defaults to the JVM tmpdir (right for the single-node harness). On a
  * real cluster a driver-local tmpdir is INVISIBLE to executors on other
  * nodes — set `SPARK_GRAFT_WAREHOUSE` to a shared-filesystem mount
  * (HDFS/NFS/object-store fuse) and every artifact builds and serves from
  * there instead; nothing else changes.
  */
object Warehouse {

  lazy val root: String = sys.env.get("SPARK_GRAFT_WAREHOUSE")
    .map { p =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
      p
    }
    .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Absolute path of a named artifact under the warehouse root. */
  def path(name: String): String =
    java.nio.file.Paths.get(root, name).toString
}
