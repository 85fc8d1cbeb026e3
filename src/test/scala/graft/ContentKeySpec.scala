package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

/** The derived-cache invalidation contract (ADVICE r01): regenerating a
  * source at the same path must change its key; distinct paths must not
  * collide. */
class ContentKeySpec extends AnyFunSuite {

  test("key changes when file content size or mtime changes, stable otherwise") {
    val dir = Files.createTempDirectory("ck")
    val f = dir.resolve("t.parquet")
    Files.writeString(f, "abc")
    val k1 = ContentKey.key(f)
    assert(k1 == ContentKey.key(f), "key must be deterministic")
    Files.setLastModifiedTime(f, FileTime.fromMillis(
      Files.getLastModifiedTime(f).toMillis + 5000))
    val k2 = ContentKey.key(f)
    assert(k1 != k2, "regenerated (newer mtime) source must change the key")
    Files.writeString(f, "abcd")
    assert(ContentKey.key(f) != k2, "size change must change the key")
  }

  test("distinct paths and missing paths do not collide") {
    val dir = Files.createTempDirectory("ck2")
    val a = dir.resolve("a"); val b = dir.resolve("b")
    Files.writeString(a, "same"); Files.writeString(b, "same")
    assert(ContentKey.key(a) != ContentKey.key(b),
      "same content at different paths must not share a cache entry")
    assert(ContentKey.key(dir.resolve("missing")) !=
      ContentKey.key(Paths.get("/also/missing")))
  }
}
