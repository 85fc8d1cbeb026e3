package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** The typed Dataset[T] surface: case-class Encoders, typed filter/map,
  * `groupByKey` + typed aggregators — the compile-time-safe API tier.
  *
  * Scale note (why the REST of the engine is Column-based): typed lambdas
  * deserialize every row into a JVM object and are opaque to Catalyst — no
  * predicate pushdown through them, no whole-stage codegen inside them.
  * Right for complex domain logic; wrong for hot scan paths. This query
  * pins that the typed tier exists and agrees with the declarative oracle.
  */
object Typed {

  case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double)

  val entries: Seq[QueryDef] = Seq(
    QueryDef("q50_typed_pipeline",
      """SELECT user_id, count(*) AS n,
        |       round(1e-9 + sum(value), 4) AS sum_hi
        |FROM events WHERE value >= 100.0 AND event_type <> 'error'
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      val agged = ds
        .filter(e => e.value >= 100.0 && e.event_type != "error")
        .groupByKey(_.user_id)
        .mapGroups { (uid, it) =>
          // streaming fold, no group materialization: the round-4 + 1e-9
          // nudge absorbs summation-order drift here exactly as it does
          // for every built-in sum() in the suite
          var n = 0L
          var total = 0.0
          it.foreach { e => n += 1; total += e.value }
          (uid, n, total)
        }
      agged.toDF("user_id", "n", "sum_raw")
        .select(col("user_id"), col("n"),
          Num.roundOut(col("sum_raw"), 4).as("sum_hi"))
        .orderBy(col("user_id"))
    },

    // Grouped-map surface (the applyInPandas / pandas groupby-apply
    // analog): flatMapGroups hands the WHOLE group to arbitrary JVM code
    // and emits any number of rows back — the escape hatch for per-entity
    // logic no Column expression covers. Demonstrated on per-user min-max
    // normalization; the result is pinned against the declarative window
    // oracle, so the imperative tier provably agrees with the relational
    // one.
    //
    // Scale contract: ONE group buffers in executor memory, so the group
    // key must be bounded-cardinality-per-key (per-user here — thousands
    // of rows each — never per-event_type, where one group would be a
    // third of the corpus). norm depends only on the group's exact
    // min/max, not on fold order, so iteration order can't drift the hash.
    QueryDef("q59_grouped_map",
      """WITH m AS (
        |  SELECT user_id, event_id, value,
        |         min(value) OVER (PARTITION BY user_id) AS mn,
        |         max(value) OVER (PARTITION BY user_id) AS mx
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT user_id, event_id, value,
        |       round(1e-9 + CASE WHEN mx = mn THEN 0.0
        |                         ELSE (value - mn) / (mx - mn) END, 6) AS norm
        |FROM m ORDER BY event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      ds.groupByKey(_.user_id)
        .flatMapGroups { (uid, it) =>
          val rows = it.toVector // the grouped-map contract: group in memory
          var mn = Double.MaxValue
          var mx = Double.MinValue
          rows.foreach { e =>
            if (e.value < mn) mn = e.value
            if (e.value > mx) mx = e.value
          }
          rows.iterator.map { e =>
            val norm = if (mx == mn) 0.0 else (e.value - mn) / (mx - mn)
            (uid, e.event_id, e.value, norm)
          }
        }
        .toDF("user_id", "event_id", "value", "norm_raw")
        .select(col("user_id"), col("event_id"), col("value"),
          Num.roundOut(col("norm_raw"), 6).as("norm"))
        .orderBy(col("event_id"))
    }
  )
}
