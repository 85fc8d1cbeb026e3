package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink-semantics pins (S6 replace-mode write + S8 write verification,
  * reference etl.py:162-221) and the IVF ANN / extensions paths. */
class SinksAndIvfSpec extends AnyFunSuite {
  import SparkTestSession._

  test("overwrite-mode sinks roundtrip across parquet/json/csv (S6/S8)") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toString
    val src = operators.Flagship(spark, sf0_001)
    // replace semantics: write twice with different content, last wins
    src.limit(3).write.mode("overwrite").parquet(s"$dir/pq")
    src.write.mode("overwrite").parquet(s"$dir/pq")
    val pq = spark.read.parquet(s"$dir/pq")
    assert(pq.count() == src.count()) // S8 write verification
    assert(pq.exceptAll(src).isEmpty && src.exceptAll(pq).isEmpty)

    src.write.mode("overwrite").json(s"$dir/js")
    val js = spark.read.json(s"$dir/js")
    assert(js.count() == src.count())

    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val csv = spark.read.option("header", "true").csv(s"$dir/csv")
    assert(csv.count() == src.count())

    // partitioned write prunes: reading one partition touches one dir
    src.write.mode("overwrite").partitionBy("lo").parquet(s"$dir/part")
    val one = spark.read.parquet(s"$dir/part").filter(col("lo") === 0)
    assert(one.count() == 1)
  }

  test("IVF ANN finds the exact duplicate vector and agrees with brute force on top-1") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def vec() = Seq.fill(64)(rnd.nextFloat() - 0.5f)
    val v0 = vec()
    val rows = (0L until 120L).map { i =>
      val v = if (i == 0 || i == 77) v0 else vec() // 77 duplicates query 0
      (i, v, (i % 10).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("x14_ann_ivf")(spark, dir).collect()
    val q0 = got.filter(_.getLong(0) == 0L)
    assert(q0.nonEmpty, "query 0 must have candidates")
    val top = q0.minBy(_.getInt(3))
    assert(top.getLong(1) == 77L && top.getDouble(2) == 1.0,
      s"duplicate vector must be IVF top-1: ${q0.toSeq}")
  }

  test("GraftExtensions injects st_contains_ring without error") {
    val ext = new SparkSessionExtensions
    new graft.plans.GraftExtensions()(ext) // must not throw
  }

  test("SQL zorder(a, b) equals PhysicalDesign.zValue over the full domain grid") {
    import org.apache.spark.sql.functions._
    graft.plans.ZOrderSql.register(spark)
    val grid = spark.range(0, 256 * 256)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    val mismatches = grid
      .withColumn("zc", graft.operators.PhysicalDesign.zValue(col("a"), col("b")))
      .withColumn("zs", expr("zorder(a, b)"))
      .filter(col("zc") =!= col("zs")).count()
    assert(mismatches == 0L)
    // and the curve is a bijection on the 16-bit domain
    val distinct = grid.select(expr("zorder(a, b)")).distinct().count()
    assert(distinct == 256L * 256L, s"zorder must be a bijection, got $distinct")
  }
}
