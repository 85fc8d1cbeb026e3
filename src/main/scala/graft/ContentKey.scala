package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Content fingerprint for derived-data caches (matview parquet, stream
  * staging dirs). Keyed on every file's (relative path, size, mtime) under
  * the source — regenerating the source at the same path, or two distinct
  * sources, produce different keys, so a cache keyed by [[key]] never
  * serves stale or colliding data (ADVICE r01: dir.hashCode had neither
  * property).
  */
object ContentKey {

  /** 16-hex digest of the file-or-tree at `path` (absolute path string,
    * plus each file's relative name, size, mtime when it exists — so a
    * missing path's key is the digest of its path alone). */
  def key(path: Path): String = {
    val root = path.toAbsolutePath // relativize() throws across path kinds
    val md = MessageDigest.getInstance("MD5")
    md.update(root.toString.getBytes("UTF-8"))
    if (Files.exists(root)) {
      val files =
        if (Files.isDirectory(root)) {
          val stream = Files.walk(root)
          try stream.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
          finally stream.close()
        } else Seq(root)
      files.map(f => (root.relativize(f.toAbsolutePath).toString, f)).sortBy(_._1)
        .foreach { case (rel, f) =>
          md.update(s"$rel|${Files.size(f)}|${Files.getLastModifiedTime(f).toMillis}"
            .getBytes("UTF-8"))
        }
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  def key(path: String): String = key(Paths.get(path))
}
