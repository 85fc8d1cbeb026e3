package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.{Multimodal, Similarity}
import graft.streaming.Streams

/** Pins for the non-SQL-expressible extension operators (MinHash/SimHash/
  * ANN/approx-distinct/multimodal/streaming-state) that the DuckDB oracle
  * can't check. */
class ExtensionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash LSH surfaces exact and near duplicates first") {
    val base = "spark table join merge window sort filter scan batch stream " * 8
    val near = base.trim.split(" ").dropRight(2).mkString(" ") + " extra token"
    val dir = docsDir(Seq(
      (1L, base.trim, "s0"),
      (2L, base.trim, "s0"),          // exact dup of 1
      (3L, near, "s0"),               // near dup of 1
      (4L, "completely different words entirely unrelated corpus sample text here now", "s1"),
      (5L, "another unrelated document with its own vocabulary set for contrast", "s1")))
    val got = SparkEntry.queries("x02_minhash_lsh")(spark, dir).collect()
    assert(got.nonEmpty)
    val top = got.head
    assert((top.getLong(0), top.getLong(1)) == (1L, 2L) && top.getDouble(2) == 1.0,
      s"expected exact-dup pair first, got ${got.toSeq}")
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "near-dup pairs must be surfaced by LSH")
  }

  test("simhash: identical docs collide at hamming 0, unrelated docs don't") {
    val base = "spark table join merge window sort filter scan batch stream " * 8
    val dir = docsDir(Seq(
      (1L, base.trim, "s0"),
      (2L, base.trim, "s0"),
      (3L, "completely different words entirely unrelated corpus sample text here now", "s1")))
    val got = SparkEntry.queries("x03_simhash")(spark, dir).collect()
    val byPair = got.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(byPair.get((1L, 2L)) == Some(0L), s"exact dups must be hamming 0: ${got.toSeq}")
    byPair.get((1L, 3L)).foreach(h => assert(h > 10))
  }

  test("ANN LSH always finds an exact duplicate vector and ranks it first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(64)(rnd.nextFloat() - 0.5f)
    val v0 = vec()
    val rows = (0L until 50L).map { i =>
      val v = if (i == 20) v0 else vec() // vec 20 duplicates query vec 0
      (i, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // overwrite query 0's embedding with the duplicate source
    val got = SparkEntry.queries("x06_ann_lsh")(spark,
      { // rewrite row 0 = v0 too
        val df = spark.read.parquet(s"$dir/embeddings.parquet")
        val fixed = df.filter(col("vec_id") =!= 0)
          .unionByName(Seq((0L, v0, 0)).toDF("vec_id", "embedding", "label"))
        val dir2 = java.nio.file.Files.createTempDirectory("emb2").toString
        fixed.write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
        dir2
      })
    val q0 = got.collect().filter(_.getLong(0) == 0L)
    assert(q0.nonEmpty, "query 0 must have candidates")
    val first = q0.minBy(_.getInt(3))
    assert(first.getLong(1) == 20L && first.getDouble(2) == 1.0,
      s"duplicate vector must rank first for its query: ${q0.toSeq}")
  }

  test("langid profile is capped at K words per language") {
    val prof = graft.operators.TextAnalysis.langProfile(spark, sf0_01)
    val nLangs = prof.select("plang").distinct().count()
    val perLang = prof.groupBy("plang").count().collect()
    perLang.foreach { r =>
      assert(r.getLong(1) <= graft.operators.TextAnalysis.ProfileK,
        s"${r.getString(0)} profile exceeds K")
    }
    assert(prof.count() <= graft.operators.TextAnalysis.ProfileK * nLangs)
  }

  test("approx distinct within 10% of exact") {
    val exact = SparkEntry.queries("x11_distinct_exact")(spark, sf0_01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("x12_distinct_approx")(spark, sf0_01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.10, s"$k: approx $a vs exact $n")
    }
  }

  test("quantile sketch within 5% of exact percentiles") {
    val exact = SparkEntry.queries("q32_quantiles")(spark, sf0_01)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    SparkEntry.queries("x27_quantile_sketch")(spark, sf0_01).collect().foreach { r =>
      val (p50, p95) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) / p50 < 0.05,
        s"${r.getString(0)}: p50 sketch ${r.getDouble(1)} vs exact $p50")
      assert(math.abs(r.getDouble(2) - p95) / p95 < 0.05,
        s"${r.getString(0)}: p95 sketch ${r.getDouble(2)} vs exact $p95")
    }
  }

  test("multimodal decode: stable schema, deterministic, partition-preserving") {
    val payloads = Multimodal.ppmPayloads(spark, sf0_001).repartition(4)
    val out = Multimodal.decodeImages(payloads)
    assert(out.schema == Multimodal.decodedSchema)
    assert(out.rdd.getNumPartitions == 4) // iterator transform, no shuffle
    val a = out.orderBy("doc_id").collect()
    val b = Multimodal.decodeImages(payloads).orderBy("doc_id").collect()
    assert(a.sameElements(b)) // deterministic decode
    val r0 = a.head
    assert(r0.getInt(1) == 8 && r0.getInt(2) >= 1 && r0.getInt(3) == 3)
    val feats = r0.getSeq[Double](4)
    assert(feats.length == 8 && math.abs(feats.sum - 1.0) < 1e-9)
  }

  test("streaming daily agg equals batch daily agg") {
    val streamed = Streams.streamingDaily(spark, sf0_001)
    val batch = Tables.events(spark, sf0_001)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("batch gaps-and-islands sessionization equals streaming state machine") {
    val batch = SparkEntry.queries("q34_sessions_batch")(spark, sf0_001)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    val streamed = Streams.sessionize(spark,
        Tables.events(spark, sf0_001).select(col("user_id"), col("ts")), 30)
      .select(col("user_id"), col("n_sessions").cast("long").as("n_sessions"),
        col("n_events"))
    assert(batch.exceptAll(streamed).isEmpty && streamed.exceptAll(batch).isEmpty)
  }

  test("sessionize counts gap-separated sessions per user") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      (1L, t(0)), (1L, t(5)), (1L, t(90)),  // user 1: 2 sessions (gap 85 min)
      (2L, t(0))                            // user 2: 1 session
    ).toDF("user_id", "ts")
    val got = Streams.sessionize(spark, events, gapMinutes = 30)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got(1L) == ((2, 3L)) && got(2L) == ((1, 1L)))
  }
}
