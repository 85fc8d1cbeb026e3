package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Production state-backend pin: the SAME streaming aggregation runs on the
  * RocksDB state store provider (the backend every large-scale deployment
  * uses — state lives off-heap/on-disk, bounded memory per store instead of
  * the default HDFS-backed in-memory map) and must produce byte-identical
  * results to the default provider. State-backend choice is a deployment
  * knob, never a semantics knob — this spec is what makes that claim
  * checkable rather than asserted. */
class StateBackendSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming agg on RocksDB state store == default provider == batch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("rocks_src").toString
    (1 to 200).map(i => (i.toLong, i % 7, i * 1.5))
      .toDF("event_id", "k", "value")
      .coalesce(2).write.mode("append").parquet(src)

    def runWith(provider: Option[String]): Map[Int, (Long, Double)] = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      provider.foreach(p =>
        ss.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      val sink = s"rocks_sink_${provider.isDefined}"
      val agg = ss.readStream
        .schema(ss.read.parquet(src).schema).parquet(src)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      val q = agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(sink).start()
      try q.processAllAvailable() finally q.stop()
      ss.table(sink).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }

    val rocks = runWith(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val dflt = runWith(None)
    assert(rocks == dflt, "state backend changed the answer")

    val batch = spark.read.parquet(src).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rocks == batch)
    assert(rocks.size == 7)
  }

  test("Trigger.AvailableNow drains all input in bounded batches, then stops") {
    import spark.implicits._
    // the production BACKFILL trigger: process everything currently
    // available in rate-limited micro-batches, then terminate — unlike
    // processAllAvailable (test-only blocking) or continuous triggers.
    val src = java.nio.file.Files.createTempDirectory("an_src").toString
    (1 to 90).map(i => (i.toLong, i % 5)).toDF("id", "k")
      .coalesce(3).write.mode("append").parquet(src)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val agg = ss.readStream
      .schema(ss.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1") // rate limit → ≥3 micro-batches
      .parquet(src)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("an_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow terminates BY ITSELF once the snapshot is drained
    assert(q.awaitTermination(120000), "query did not self-terminate")
    val got = ss.table("an_sink").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 18L, 1 -> 18L, 2 -> 18L, 3 -> 18L, 4 -> 18L))
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      "rate limit was ignored — backfill ran as one giant batch")
  }
}
