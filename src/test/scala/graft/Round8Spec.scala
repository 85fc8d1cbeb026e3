package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 pins.
  *
  * 1. The `events.ts` ENCODING contract: the driver's testdata generator has
  *    already shipped `ts` two ways (parquet TIMESTAMP(NANOS) through r6,
  *    TIMESTAMP_NTZ(MICROS) from r7's regen), and the switch silently broke
  *    14 queries because ingest assumed one encoding. [[Tables.normalizeTs]]
  *    must yield the SAME micro-precision TimestampType instants for every
  *    encoding the generator has used — pinned here on a crafted fixture
  *    written all three ways, so the next drift fails this spec instead of
  *    being discovered by the driver's correctness run.
  */
class Round8Spec extends AnyFunSuite {
  import SparkTestSession._

  private def writeEncodings(): (String, String, String) = {
    val base = Files.createTempDirectory("graft_ts_enc").toString
    // Instants chosen to straddle a midnight within 1 ms (the day-boundary
    // rounding hazard the nanos path's integer `div` exists to avoid) plus
    // a plain mid-day instant; micros resolution on the NTZ side.
    val micros = Seq(
      (1L, 1700006399999999L), // 1 us before a midnight
      (2L, 1700006400000001L), // 1 us after it
      (3L, 1700050000123456L))
    import spark.implicits._
    val asLongNanos = micros.toDF("event_id", "us")
      .select(col("event_id"), (col("us") * 1000L).as("ts"))
    val asNtz = micros.toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val asTs = micros.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val (d1, d2, d3) = (s"$base/nanos_long", s"$base/ntz", s"$base/tstz")
    asLongNanos.write.parquet(d1)
    asNtz.write.parquet(d2)
    asTs.write.parquet(d3)
    (d1, d2, d3)
  }

  test("normalizeTs yields identical TimestampType instants for long-nanos, NTZ-micros, and plain-timestamp encodings") {
    val (d1, d2, d3) = writeEncodings()
    val dfs = Seq(d1, d2, d3).map(d => Tables.normalizeTs(spark.read.parquet(d)))
    dfs.foreach { df =>
      assert(df.schema("ts").dataType == TimestampType, df.schema.treeString)
    }
    val canon = dfs.map(
      _.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(canon(0) == canon(1), "long-nanos vs NTZ-micros instants diverge")
    assert(canon(0) == canon(2), "long-nanos vs plain-timestamp instants diverge")
    assert(canon(0).map(_._2) == Seq(1700006399999999L, 1700006400000001L, 1700050000123456L))
  }

  test("the shipped events table normalizes to TimestampType (whatever encoding the driver last generated)") {
    val ev = Tables.events(spark, sf0_001)
    assert(ev.schema("ts").dataType == TimestampType)
    // to_date must be usable directly — this is what q34/q77/q79 and the
    // streaming tier all assume downstream of the normalizer.
    assert(ev.select(to_date(col("ts"))).distinct().count() > 0)
  }
}

/** Per-query analyzability canary (VERDICT r7 item 8): every registered
  * query must at least RESOLVE its plan on sf0.001 — one targeted test per
  * query, so a single broken query fails one named test instead of
  * surfacing through FlagshipSpec's heavier all-rows sweep or, worse, the
  * driver's correctness run. Construction only + `analyzed`: no action is
  * triggered for batch queries (streaming defs execute on construction by
  * design — they still count: failing construction IS the regression). */
class QueryAnalyzabilitySpec extends AnyFunSuite {
  import SparkTestSession._

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"analyzes: $name") {
      val df = fn(spark, sf0_001)
      assert(df.queryExecution.analyzed != null)
    }
  }
}
