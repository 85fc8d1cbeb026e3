package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 pins. Centerpiece: atomic concurrency-safe artifact
  * publication (VERDICT r11 item 1) — two builders racing on one content
  * key must both come away with a consistent artifact, with no torn
  * directory and no leaked temp, converting the former "never run Verify
  * and tests concurrently" protocol rule into code.
  */
class Round12Spec extends AnyFunSuite {
  import SparkTestSession._

  private def tempDirs(prefix: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(Warehouse.root)
    val l = java.nio.file.Files.list(root)
    try l.iterator().asScala
      .filter(_.getFileName.toString.startsWith(prefix + ".build-"))
      .toSeq
    finally l.close()
  }

  test("two concurrent DerivedTable builders on one key both read a consistent artifact; no torn dir, no leaked temp") {
    val tag = "r12race"
    val key = ContentKey.key(
      java.nio.file.Paths.get(sf0_001, "documents.parquet"))
    val out = Warehouse.path(
      operators.DerivedTable.dirName(tag, 1, key))
    Publish.deleteTree(java.nio.file.Paths.get(out))

    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(): Array[(Long, Long)] = {
      barrier.await() // both threads pass the isPublished check together
      val df = operators.DerivedTable(spark, sf0_001, "documents", tag) {
        builds.incrementAndGet()
        Thread.sleep(50) // widen the race window
        Tables.documents(spark, sf0_001)
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .select(xxhash64(col("lang")).as("k"), col("n"))
      }
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(() => build())
      val fb = pool.submit(() => build())
      val (ra, rb) = (fa.get(), fb.get())
      val expect = Tables.documents(spark, sf0_001)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .select(xxhash64(col("lang")).as("k"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(ra.toSeq == expect.toSeq && rb.toSeq == expect.toSeq,
        "both racers must read the winner's complete artifact")
      assert(builds.get() == 2,
        "the barrier must have forced BOTH builders past the published check")
      assert(Publish.isPublished(out), "the winner's artifact is published")
      assert(tempDirs(operators.DerivedTable.dirName(tag, 1, key)).isEmpty,
        "the loser's temp dir must be cleaned up")
    } finally pool.shutdown()
  }

  test("Publish.once recovers a crashed legacy direct-write remnant (dir without marker)") {
    val out = java.nio.file.Paths.get(Warehouse.path("graft_r12remnant_v1_x"))
    Publish.deleteTree(out)
    java.nio.file.Files.createDirectories(out)
    java.nio.file.Files.write(out.resolve("part-torn.parquet"),
      "torn".getBytes("UTF-8")) // a torn write: files but no _SUCCESS
    Publish.once(out.toString, stampMarker = true) { tmp =>
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve("data.txt"), "good".getBytes("UTF-8"))
    }
    assert(Publish.isPublished(out.toString))
    assert(!java.nio.file.Files.exists(out.resolve("part-torn.parquet")),
      "the remnant must be replaced, not merged into")
    assert(java.nio.file.Files.exists(out.resolve("data.txt")))
    Publish.deleteTree(out)
  }

  test("Publish.once is a no-op on an already-published artifact (loser-reads-winner contract)") {
    val out = java.nio.file.Paths.get(Warehouse.path("graft_r12noop_v1_x"))
    Publish.deleteTree(out)
    Publish.once(out.toString, stampMarker = true) { tmp =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    }
    var ran = false
    Publish.once(out.toString) { _ => ran = true }
    assert(!ran, "a published artifact must never rebuild")
    Publish.deleteTree(out)
  }

  test("streaming scratch is process-isolated: per-JVM token under the warehouse root") {
    assert(Scratch.root.startsWith(Warehouse.root))
    assert(Scratch.root.contains(s"graft_scratch_r${Publish.runToken}"),
      "scratch root must carry the per-JVM run token so two JVMs can never " +
        "share mutable streaming state")
    assert(Publish.runToken.nonEmpty && Publish.runToken.length == 8)
  }
}
