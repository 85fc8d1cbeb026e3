package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Geo, Text}
import graft.operators.Merge

/** ScalaCheck-generated property pins (SURVEY.md §5.3): dedup idempotence,
  * merge algebra, WKT roundtrip, jaccard bounds, fingerprint range.
  * Samples are drawn from seeded generators and run through real Spark
  * plans (small N — each property is a handful of Spark jobs).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    LazyList.iterate(Seed(seed))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  private val eventGen: Gen[List[(Long, Long, Long, String, Double)]] =
    Gen.listOfN(40, for {
      id <- Gen.choose(0L, 30L)
      ts <- Gen.choose(0L, 5L) // coarse → frequent ties exercise tiebreak
      user <- Gen.choose(1L, 4L)
      typ <- Gen.oneOf("a", "b")
      v <- Gen.choose(0, 9999).map(_ / 100.0)
    } yield (id, ts, user, typ, v))

  private def toDF(rows: List[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.map { case (id, t, u, ty, v) =>
      (id, new Timestamp(1700000000000L + t * 1000L), u, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private val keys = Seq("user_id", "event_type")
  private val ord = Seq(col("ts").desc, col("event_id").desc)

  test("property: keepLatest is idempotent") {
    samples(eventGen, 5, 11L).foreach { rows =>
      val df = toDF(rows)
      val once = Merge.keepLatest(df, keys, ord)
      val twice = Merge.keepLatest(once, keys, ord)
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    }
  }

  test("property: upsert(a,b) == keepLatest(a ∪ b) and re-merge is a no-op") {
    samples(Gen.zip(eventGen, eventGen), 5, 23L).foreach { case (ra, rb) =>
      val (a, b) = (toDF(ra), toDF(rb))
      val merged = Merge.upsert(a, b, keys, ord)
      val direct = Merge.keepLatest(a.unionByName(b), keys, ord)
      assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
      val again = Merge.upsert(merged, b, keys, ord)
      assert(again.exceptAll(merged).isEmpty && merged.exceptAll(again).isEmpty)
    }
  }

  test("property: WKT point roundtrip parse(format(p)) == p") {
    import spark.implicits._
    val pts = samples(Gen.zip(
      Gen.choose(-18000, 18000).map(_ / 100.0),
      Gen.choose(-9000, 9000).map(_ / 100.0)), 40, 37L)
    val df = pts.toDF("x", "y")
      .withColumn("pt", Geo.parsePointWkt(Geo.formatPointWkt(col("x"), col("y"))))
    val bad = df.filter(Geo.stX(col("pt")) =!= col("x") ||
      Geo.stY(col("pt")) =!= col("y")).count()
    assert(bad == 0)
  }

  test("property: jaccard ∈ [0,1], self-jaccard = 1, symmetric") {
    import spark.implicits._
    val texts = samples(Gen.listOfN(12,
      Gen.oneOf("spark", "table", "join", "scan", "merge", "sort", "agg"))
      .map(_.mkString(" ")), 20, 41L)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("tri", Text.shingles(col("text"), 3))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(Text.jaccard(col("a.tri"), col("b.tri")).as("jab"),
        Text.jaccard(col("b.tri"), col("a.tri")).as("jba"),
        (col("a.id") === col("b.id")).as("same"))
    assert(pairs.filter(col("jab") < 0 || col("jab") > 1).count() == 0)
    assert(pairs.filter(col("jab") =!= col("jba")).count() == 0)
    assert(pairs.filter(col("same") && col("jab") =!= 1.0).count() == 0)
  }

  test("property: fingerprint is deterministic and in [0, 1e9+7)") {
    import spark.implicits._
    val texts = samples(Gen.listOfN(8,
      Gen.oneOf("alpha", "beta", "gamma", "delta")).map(_.mkString(" ")), 25, 53L)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val fp1 = df.select(col("id"), Text.fingerprint(col("text")).as("fp"))
    val fp2 = df.select(col("id"), Text.fingerprint(col("text")).as("fp"))
    assert(fp1.exceptAll(fp2).isEmpty)
    assert(fp1.filter(col("fp") < 0 || col("fp") >= 1000000007L).count() == 0)
    // same text ⇒ same fp
    val j = fp1.as("x").join(fp2.as("y"),
      col("x.id") === col("y.id") && col("x.fp") =!= col("y.fp"))
    assert(j.count() == 0)
  }

  test("property: int8 quantization error is bounded by one code step") {
    // floor quantization: |v - q·scale/127| < scale/127 per element, so the
    // mean over any vector obeys the same bound (x24's safety contract).
    val out = SparkEntry.queries("x24_sq8")(spark, sf0_001)
    val bad = out.filter(
      col("mean_abs_err") > col("scale") / 127 + lit(1e-6)).count()
    assert(bad == 0, s"$bad vectors exceed the one-step error bound")
  }

  test("property: connected components are invariant to edge partitioning") {
    import spark.implicits._
    val edges = samples(for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield (math.min(a, b), math.max(a, b)), 40, 67L)
    val df = edges.toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.connectedComponents(d)
        .as[(Long, Long)].collect().toMap
    val one = run(df.coalesce(1))
    val many = run(df.repartition(13))
    assert(one == many, "labels must not depend on physical partitioning")
  }

  private val wordsGen: Gen[List[String]] =
    Gen.listOfN(120, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty),
      Gen.oneOf("hot", "hot", "hot", "warm", "warm", "rare")))

  test("property: count-min never underestimates, any split point") {
    import graft.functions.{CountMinAggregator, Sketches}
    val agg = new CountMinAggregator(4, 16)
    samples(wordsGen, 4, 91L).foreach { words =>
      def sk(xs: Seq[String]) =
        xs.foldLeft(agg.zero.clone())((b, x) => agg.reduce(b, x))
      val whole = sk(words)
      val truth = words.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (w, c) =>
        val est = (0 until 4)
          .map(i => whole(i * 16 + (Sketches.foldHash(w, i) % 16).toInt)).min
        assert(est >= c, s"underestimate for $w: $est < $c")
      }
      // merge at an arbitrary point == one-shot
      val cut = words.length / 3
      val (l, r) = words.splitAt(cut)
      assert(agg.merge(sk(l), sk(r)).toSeq == whole.toSeq)
    }
  }

  test("property: bloom has no false negatives under any split/merge") {
    import graft.functions.{BloomAggregator, Sketches}
    val agg = new BloomAggregator(4, 256)
    samples(wordsGen, 4, 92L).foreach { words =>
      def sk(xs: Seq[String]) =
        xs.foldLeft(agg.zero.clone())((b, x) => agg.reduce(b, x))
      val (l, r) = words.splitAt(words.length / 2)
      val merged = agg.merge(sk(l), sk(r))
      words.foreach { w =>
        val hit = (0 until 4).forall { i =>
          val p = (Sketches.foldHash(w, i) % 256).toInt
          (merged(p >> 6) & (1L << (p & 63))) != 0L
        }
        assert(hit, s"false negative for inserted word $w")
      }
    }
  }

  test("property: Jaro-Winkler kernel — symmetry, range, identity, boost algebra") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.plans.JaroWinklerAlgo.score(
        UTF8String.fromString(a), UTF8String.fromString(b))
    val strGen = Gen.listOfN(12,
      Gen.choose(0, 11).map("abcdefg hij-".charAt)).map(_.mkString.trim)
    val pairGen = for { a <- strGen; b <- strGen } yield (a, b)
    samples(pairGen, 300, 37L).foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range for ($a, $b): $s")
      assert(s == jw(b, a), s"symmetry for ($a, $b)")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity for $a")
      if (a.isEmpty || b.isEmpty) assert(s == 0.0)
      // Winkler boost algebra: the prefix bonus only ever raises the
      // plain Jaro score, by at most 0.4·(1−jaro) (prefix cap 4), and
      // never past 1 — recomputed against an independent plain-Jaro fold
      val jaro = {
        val (n, m) = (a.length, b.length)
        if (n == 0 || m == 0) 0.0
        else {
          val window = math.max(math.max(n, m) / 2 - 1, 0)
          val bm = Array.fill(m)(false)
          val matchesA = a.indices.flatMap { i =>
            val js = math.max(0, i - window) to math.min(m - 1, i + window)
            js.find(j => !bm(j) && a(i) == b(j)).map { j =>
              bm(j) = true; (i, j)
            }
          }
          if (matchesA.isEmpty) 0.0
          else {
            val bs = matchesA.map(_._2).sorted
            val t = matchesA.map(_._1).map(a(_)).zip(bs.map(b(_)))
              .count { case (x, y) => x != y }
            val md = matchesA.size.toDouble
            (md / n + md / m + (md - t / 2.0) / md) / 3.0
          }
        }
      }
      assert(s + 1e-12 >= jaro, s"boost must not lower jaro ($a, $b)")
      assert(s <= jaro + 0.4 * (1.0 - jaro) + 1e-12,
        s"boost beyond the 4-char cap ($a, $b)")
      if (jaro <= 0.7) assert(math.abs(s - jaro) < 1e-12,
        s"boost below threshold ($a, $b)")
    }
  }
}
