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

  /** 16-hex digest of the file-or-tree at `path` (existence, relative
    * names, sizes, mtimes). Missing path digests to a constant. */
  def key(path: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    md.update(path.toString.getBytes("UTF-8"))
    if (Files.exists(path)) {
      val files =
        if (Files.isDirectory(path)) {
          val stream = Files.walk(path)
          try stream.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
          finally stream.close()
        } else Seq(path)
      files.map(f => (path.relativize(f.toAbsolutePath).toString, f)).sortBy(_._1)
        .foreach { case (rel, f) =>
          md.update(s"$rel|${Files.size(f)}|${Files.getLastModifiedTime(f).toMillis}"
            .getBytes("UTF-8"))
        }
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  def key(path: String): String = key(Paths.get(path))
}
