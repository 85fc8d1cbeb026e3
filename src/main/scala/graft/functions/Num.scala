package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Numeric output helpers shared by every oracle-paired query. */
object Num {

  /** Round for oracle-compared output. Spark's `round` rounds the double's
    * SHORTEST DECIMAL REPR half-up while DuckDB rounds the binary value —
    * an exact rational like 36.075/60 = "0.60125" then rounds to 0.6013 in
    * Spark but 0.6012 in DuckDB. Adding 1e-9 on BOTH sides (the oracle SQL
    * writes `round(1e-9 + x, n)`) pushes every value strictly off the
    * half-boundary, so both engines round the same identical double the
    * same way. The shift only ever changes a boundary value's last digit,
    * identically in both engines. */
  def roundOut(c: Column, scale: Int): Column = round(c + lit(1e-9), scale)
}
