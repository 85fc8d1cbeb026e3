package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Semantics pins for the round-6 operators: the portable char hash and
  * its oracle-pinned MinHash pipeline (x39), DSIR importance selection
  * (x38), contract validation (x40), and the TPC-H Q15/Q22 shapes
  * (q62/q63). All on the sf0.001 fixture plus crafted inputs. */
class Round6Spec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0_001)

  test("charHash: Java-style fold, hand-computed values") {
    import spark.implicits._
    val got = Seq("a", "ab", "a_b").toDF("s")
      .select(Text.charHash(col("s")).as("h")).collect().map(_.getLong(0))
    // "a" = 97; "ab" = 97*31 + 98 = 3105; "a_b" = (97*31 + 95)*31 + 98
    assert(got.toSeq == Seq(97L, 3105L, (97L * 31 + 95) * 31 + 98))
    // range invariant: always in [0, 1e9+7)
    val big = Seq("x" * 500).toDF("s")
      .select(Text.charHash(col("s")).as("h")).head().getLong(0)
    assert(big >= 0L && big < 1000000007L)
  }

  test("x39: true near-duplicates surface with high signature agreement") {
    val rows = run("x39_minhash_portable")
      .select("doc_a", "doc_b", "est", "jaccard").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (est, j) = (r.getDouble(2), r.getDouble(3))
      assert(est >= 0.0 && est <= 1.0 + 1e-9)
      assert(j >= 0.0 && j <= 1.0 + 1e-9)
    }
    // presentation order: jaccard descending
    assert(rows.map(-_.getDouble(3)).toSeq == rows.map(-_.getDouble(3)).sortBy(identity).toSeq)
    // the fixture's near-duplicates must top the report: a strong true
    // pair (sf0.001's best is jaccard ≈ 0.99) surfaces with high signature
    // agreement — the LSH recall property the portable hash must preserve
    val top = rows.head
    assert(top.getDouble(3) >= 0.9, "a true near-dup pair tops the report")
    assert(top.getDouble(2) >= 0.5, "its minhash signatures mostly agree")
  }

  test("x38: hashed-LM model is bounded and target source is excluded") {
    val out = run("x38_dsir_select").collect()
    assert(out.length == 100)
    out.foreach { r =>
      assert(r.getString(1) != "src18", "target-domain docs are not selected")
      val score = r.getDouble(3)
      // r(b) ≤ 1e6 by construction (t ≤ g) → the count-weighted mean is too
      assert(score > 0.0 && score <= 1000000.0)
    }
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sortBy(-(_: Double)), "selection is ranked by score")
  }

  test("x40: clean fixture passes key/reference contracts; checked = table counts") {
    val out = run("x40_contract_check")
      .select("rule", "checked", "violations", "pass").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.size == 9)
    val li = Tables.table(spark, sf0_001, "lineitem").count()
    val ord = Tables.table(spark, sf0_001, "orders").count()
    assert(out("lineitem_fk_orders")._1 == li)
    assert(out("orders_fk_customer")._1 == ord)
    // the synthetic star schema is referentially intact with unique
    // dimension keys…
    Seq("lineitem_fk_orders", "orders_pk_unique", "orders_fk_customer",
      "customer_pk_unique", "customer_name_notnull")
      .foreach { rule =>
        assert(out(rule)._2 == 0L && out(rule)._3, s"$rule should pass clean")
      }
    // …but lineitem (orderkey, linenumber) is NOT unique in the fixture —
    // the report must actually catch dirty data, not rubber-stamp it
    assert(out("lineitem_pk_unique")._2 > 0L && !out("lineitem_pk_unique")._3,
      "the fixture's duplicated lineitem keys must be reported")
    out.values.foreach { case (_, v, pass) => assert(pass == (v == 0L)) }
  }

  test("x41: later copy of a 5-gram span is cut, first occurrence survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("span").toString
    Seq(
      (1L, "a b c d e tail1 tail2"),          // first occurrence of a_b_c_d_e
      (2L, "x y a b c d e z"),                // repeats it at offset 2
      (3L, "short doc only"))                 // < 5 tokens: untouched
      .toDF("doc_id", "text")
      .withColumn("source", lit("s0")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x41_span_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((7, 7, "a b c d e tail1 tail2")), "first copy intact")
    assert(out(2L) == ((8, 3, "x y z")), "covered span dropped, rest spliced")
    assert(out(3L) == ((3, 3, "short doc only")), "sub-gram docs untouched")
  }

  test("st06: the split stage yields two micro-batches to merge across") {
    // the staging helper reads raw events (nanos ts) — same conf its
    // production caller (the streaming conf scope) provides
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = graft.streaming.Streams.stageEventsSplit(spark, sf0_001)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
    val parquets = try files.filter(_.toString.endsWith(".parquet")).count()
      finally files.close()
    assert(parquets == 2L,
      "incremental agg maintenance must actually see >1 batch")
  }

  test("q64: running distinct counts the first sighting of each type once") {
    val rows = SparkEntry.queries("q64_running_distinct")(spark, sf0_001)
      .collect()
    // per user: non-decreasing, starts at 1, steps by at most 1
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val counts = rs.map(_.getLong(3))
      assert(counts.head == 1L)
      counts.sliding(2).foreach { case Array(a, b) =>
        assert(b == a || b == a + 1)
      case _ => ()
      }
    }
  }

  test("q62: every returned supplier is tied at the maximum revenue") {
    val rows = run("q62_top_supplier").select("total_rev").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(0)).distinct.length == 1,
      "Q15 semantics: all rows share the scalar max revenue")
  }

  test("q63: dormant-rich report is non-empty and balances beat the threshold") {
    val df = run("q63_dormant_rich").collect()
    assert(df.nonEmpty)
    df.foreach(r => assert(r.getLong(1) > 0))
  }
}
