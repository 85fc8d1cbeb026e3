package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo
import graft.operators.{Dedup, Merge}

/** Edge-semantics pins (SURVEY.md §5): hand-crafted tiny inputs for the
  * behaviors the oracle can't isolate — dedup ties, merge algebra,
  * containment boundaries, WKT roundtrip, COUNT(col) null semantics. */
class OperatorSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("select-list alias shadows the child column inside LATER HOF lambdas") {
    import spark.implicits._
    // The hazard x24 hit. Plain select items resolve against the CHILD
    // (y = 3 below), but a reference inside a higher-order-function lambda
    // resolves in a later analyzer pass — after the same list has aliased
    // the name — and silently binds to the ALIAS instead. Derived
    // expressions must be computed in a withColumn BEFORE the aliasing
    // select.
    val plain = Seq(2.0).toDF("x")
      .select((col("x") * 2).as("x"), (col("x") + 1).as("y")).head()
    assert(plain.getDouble(1) == 3.0, "plain items resolve against the child")
    val lambda = Seq((Seq(1.0), 2.0)).toDF("v", "x")
      .select((col("x") * 2).as("x"),
        transform(col("v"), e => e + col("x")).as("w")).head()
    assert(lambda.getSeq[Double](1) == Seq(5.0), // 1 + ALIASED x (4), not 3
      s"lambda refs bind to the alias, got ${lambda.getSeq[Double](1)}")
  }

  test("connectedComponents: multi-hop chains collapse, components stay apart") {
    import spark.implicits._
    // chain 1-2-3-4 (1 and 4 never share an edge), separate pair 10-11,
    // cycle 20-21-22-20 — transitive closure must label each component by
    // its min node.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)
    ).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("keepLatest: newest wins, equal-ts tie broken by highest event_id") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-02 10:00:00"), 7L, "click", 2.0), // newest → wins
      (3L, ts("2024-01-01 10:00:00"), 8L, "click", 3.0), // tie on ts...
      (4L, ts("2024-01-01 10:00:00"), 8L, "click", 4.0)  // ...higher id wins
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Merge.keepLatest(df, Seq("user_id", "event_type"),
        Seq(col("ts").desc, col("event_id").desc))
      .select("event_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 4L))
  }

  test("upsert: older incoming row does NOT overwrite (conditional update)") {
    import spark.implicits._
    val existing = Seq((10L, ts("2024-01-05 00:00:00"), 1L, "click", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val incoming = Seq(
      (11L, ts("2024-01-01 00:00:00"), 1L, "click", 9.0), // older → loses
      (12L, ts("2024-01-02 00:00:00"), 2L, "click", 7.0)  // new key → insert
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val ord = Seq(col("ts").desc, col("event_id").desc)
    val got = Merge.upsert(existing, incoming, Seq("user_id", "event_type"), ord)
      .select("event_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(10L, 12L))
  }

  test("upsert is idempotent and merge-twice equals merge-once") {
    import spark.implicits._
    val keys = Seq("user_id", "event_type")
    val ord = Seq(col("ts").desc, col("event_id").desc)
    val e = Tables.events(spark, sf0_001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val base = e.filter(col("event_id") % 3 === 0)
    val inc = e.filter(col("event_id") % 3 =!= 0)
    val once = Merge.upsert(base, inc, keys, ord)
    val twice = Merge.upsert(once, inc, keys, ord)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    // and equals a straight dedup of the full table
    val direct = Merge.keepLatest(e, keys, ord)
    assert(once.exceptAll(direct).isEmpty && direct.exceptAll(once).isEmpty)
  }

  test("COUNT(col) vs COUNT(*): unmatched dimension rows count 0") {
    import spark.implicits._
    val dims = Seq((1, "a"), (2, "b"), (3, "empty")).toDF("k", "name")
    val facts = Seq((1, 10.0), (1, 11.0), (2, 12.0)).toDF("k", "v")
    val got = dims.join(facts, Seq("k"), "left")
      .groupBy("name").agg(count(facts("v")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L, "empty" -> 0L))
  }

  test("WKT point + polygon roundtrip: parse(format(g)) == g") {
    import spark.implicits._
    val df = Seq((1.5, -2.25), (0.0, 90.0), (-180.0, 0.125))
      .toDF("x", "y")
      .withColumn("pt_wkt", Geo.formatPointWkt(col("x"), col("y")))
      .withColumn("pt", Geo.parsePointWkt(col("pt_wkt")))
      .withColumn("ring_wkt", Geo.formatPolygonWkt(array(
        Geo.makePoint(col("x"), col("y")),
        Geo.makePoint(col("x") + 1, col("y")),
        Geo.makePoint(col("x") + 1, col("y") + 1),
        Geo.makePoint(col("x"), col("y")))))
      .withColumn("ring", Geo.parsePolygonWkt(col("ring_wkt")))
    val rows = df.select(
      Geo.stX(col("pt")), Geo.stY(col("pt")), col("x"), col("y"),
      element_at(col("ring"), 3).getField("x"),
      element_at(col("ring"), 3).getField("y")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2) && r.getDouble(1) == r.getDouble(3))
      assert(r.getDouble(4) == r.getDouble(2) + 1 && r.getDouble(5) == r.getDouble(3) + 1)
    }
    val wkt = df.select("pt_wkt").head().getString(0)
    assert(wkt == "POINT(1.5 -2.25)")
  }

  test("stContains: inside/outside/crossing cases for a square ring") {
    import spark.implicits._
    // unit square (0,0)-(10,10), closed ring
    val pts = Seq(
      (5.0, 5.0, true),   // inside
      (15.0, 5.0, false), // outside right
      (-1.0, 5.0, false), // outside left
      (5.0, 15.0, false), // outside above
      (9.999, 9.999, true)
    ).toDF("px", "py", "expected")
    val ring = array(
      Geo.makePoint(lit(0.0), lit(0.0)), Geo.makePoint(lit(10.0), lit(0.0)),
      Geo.makePoint(lit(10.0), lit(10.0)), Geo.makePoint(lit(0.0), lit(10.0)),
      Geo.makePoint(lit(0.0), lit(0.0)))
    val got = pts.withColumn("got", Geo.stContains(ring, col("px"), col("py")))
      .filter(col("got") =!= col("expected")).count()
    assert(got == 0)
  }

  test("as-of join: purchase matches latest click at-or-before, else null") {
    import spark.implicits._
    // crafted: user 1 click@t1, purchase@t2 (matches click),
    // user 2 purchase with no prior click (click after) → null
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 00:00:05"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 00:00:05"), 1L, "purchase", 0.0), // equal ts → click 2 matches
      (4L, ts("2024-01-01 00:00:09"), 2L, "purchase", 0.0),
      (5L, ts("2024-01-01 00:00:10"), 2L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit(null).cast("string"))
    df.createOrReplaceTempView("asof_input")
    // run the production query shape against the crafted frame via a temp dir?
    // Instead: reuse the operator by inlining the same logic through the
    // public query, pointed at a temp parquet dir.
    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q12_asof_join")(spark, dir)
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    assert(got(3L) == Some(2L)) // equal-ts click included, latest wins
    assert(got(4L) == None)     // no prior click → left-preserved null
  }

  test("flagship restores empty buckets with zero counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fb").toString
    Seq((1L, ts("2024-01-01 00:00:01"), 1L, "click", 5.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = operators.Flagship(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1)
    assert(rows.count(_.getAs[Long]("n_events") == 0) == 9)
  }
}
