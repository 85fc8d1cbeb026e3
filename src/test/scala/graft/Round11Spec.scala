package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pins. First in: the x193 strict-ordering funnel gets the
  * house brute-force pin it missed when it landed in round 10's
  * end-of-round snapshot (VERDICT r10 item 3) — the three-stage
  * earliest-qualifying-anchor funnel recomputed from collected events,
  * plus the degenerate empty-stage designed-NULL path on a clickless
  * fixture.
  */
class Round11Spec extends AnyFunSuite {
  import SparkTestSession._

  private val H24 = 24L * 3600L * 1000000L // micros

  test("x193: funnel counts and ppm conversions match a brute-force earliest-anchor recomputation") {
    val evs = Tables.events(spark, sf0_001)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    // step 1: first click; steps 2/3: first qualifying event strictly
    // after the previous anchor and within 24h of it
    val s1: Map[Long, Long] = byUser.flatMap { case (u, es) =>
      val c = es.filter(_._2 == "click").map(_._3)
      if (c.isEmpty) None else Some(u -> c.min)
    }
    def step(prev: Map[Long, Long], et: String): Map[Long, Long] =
      prev.flatMap { case (u, t) =>
        val c = byUser.getOrElse(u, Array.empty[(Long, String, Long)])
          .filter(e => e._2 == et && e._3 > t && e._3 <= t + H24).map(_._3)
        if (c.isEmpty) None else Some(u -> c.min)
      }
    val s2 = step(s1, "view")
    val s3 = step(s2, "purchase")
    val n0 = byUser.size.toLong
    val Seq(n1, n2, n3) = Seq(s1, s2, s3).map(_.size.toLong)
    assert(n0 > 0 && n1 > 0 && n2 > 0 && n3 > 0,
      s"every stage must fire at sf0.001 for the pin to bite: $n0/$n1/$n2/$n3")
    def ppm(n: Long, d: Long): Any =
      if (d == 0) null else Math.floorDiv(n * 1000000L, d)
    val expected = List(
      List(1, "click", n1, ppm(n1, n0)),
      List(2, "view", n2, ppm(n2, n1)),
      List(3, "purchase", n3, ppm(n3, n2)))
    val got = SparkEntry.queries("x193_strict_funnel")(spark, sf0_001)
      .collect().map(_.toSeq.toList).toList
    assert(got == expected)
  }

  test("x193: an empty first stage reports the designed NULL downstream, not a div-by-zero accident") {
    val dir = java.nio.file.Files.createTempDirectory("x193deg").toString
    Tables.events(spark, sf0_001)
      .filter(col("event_type") =!= "click")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("x193_strict_funnel")(spark, dir)
      .collect().map(_.toSeq.toList).toList
    assert(rows == List(
      List(1, "click", 0L, 0L),       // 0 clickers out of n0 users: 0 ppm
      List(2, "view", 0L, null),      // n1 = 0 ⇒ designed NULL
      List(3, "purchase", 0L, null))) // n2 = 0 ⇒ designed NULL
  }
}
