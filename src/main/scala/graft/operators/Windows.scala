package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num
import graft.{QueryDef, Tables}

/** Window-function battery beyond the dedup in [[Merge]] — running
  * aggregates, lag, rank (SURVEY.md §2.5; capability breadth past the
  * reference's W1/W2).
  *
  * Running sums are computed in a fully deterministic frame order
  * (ts, event_id), so both engines add doubles in the same sequence —
  * bit-identical partials, no tolerance needed beyond the shared Num.roundOut(4).
  */
object Windows {

  val entries: Seq[QueryDef] = Seq(

    QueryDef("q23_window_battery",
      """SELECT event_id, user_id,
        |       row_number() OVER w AS rn,
        |       round(1e-9 + sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
        |       lag(event_id) OVER w AS prev_event_id,
        |       rank() OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)) AS day_rank
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDay = Window.partitionBy(col("user_id")).orderBy(to_date(col("ts")))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          row_number().over(w).as("rn"),
          Num.roundOut(sum(col("value")).over(wRun), 4).as("running_value"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          rank().over(wDay).as("day_rank"))
        .orderBy(col("event_id"))
    }
  )
}
