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

  // ---- round-8 operator invariants (beyond the driver's oracle rows) ----

  test("x89 conservation: Σ n_removed == n_docs − distinct text hashes, and kept mass is never negative") {
    val out = SparkEntry.queries("x89_dedup_impact")(spark, sf0_001)
    val docs = Tables.documents(spark, sf0_001)
    val removed = out.agg(sum(col("n_removed"))).first().getLong(0)
    val expect = docs.count() - docs.select(md5(col("text"))).distinct().count()
    assert(removed == expect, "every non-first copy, and nothing else, is removed")
    assert(out.filter(col("chars_removed") > col("chars_total")).count() == 0)
  }

  test("x88 conservation: per-source token counts sum to the corpus stream; coverage in [0,1]") {
    val out = SparkEntry.queries("x88_oov_rate")(spark, sf0_001)
    val total = out.agg(sum(col("n_tokens"))).first().getLong(0)
    val stream = Tables.documents(spark, sf0_001)
      .select(explode(graft.functions.Text.tokens(col("text")))).count()
    assert(total == stream)
    assert(out.filter(col("coverage") < 0 || col("coverage") > 1).count() == 0)
    assert(out.filter(col("in_vocab") > col("n_tokens")).count() == 0)
  }

  test("x90 statistics are non-negative and every reported term meets min support") {
    val out = SparkEntry.queries("x90_vocab_shift")(spark, sf0_001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      assert(r.getAs[Long]("a") + r.getAs[Long]("b") >= 20)
    }
  }

  test("st12's converged streaming register state reproduces the batch x62 sketch row exactly") {
    // The DuckDB oracle already checks both against the same SQL; this pins
    // the stronger engine-internal equality directly (any micro-batch
    // slicing must yield the SAME registers — max-merge is order-free).
    val stream = SparkEntry.queries("st12_stream_hll")(spark, sf0_001).collect()
    val batch = SparkEntry.queries("x62_hll_portable")(spark, sf0_001).collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("m11 reports only frames shared by ≥2 docs, with occurrence ≥ doc counts") {
    val out = SparkEntry.queries("m11_frame_dedup")(spark, sf0_001).collect()
    assert(out.nonEmpty) // the fixture's duplicate docs share frames
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
    }
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
