package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TWO-PASS DISTRIBUTED RANK — the house replacement for any
  * `row_number()` whose partition is data-sized (a global rank, or a rank
  * partitioned by a low-cardinality key like `lang` or `event_type`):
  *
  *   1. coarsen the leading order column into an ORDER-PRESERVING bucket
  *      (equal keys land in equal buckets, bucket order == key order);
  *   2. rank locally within (partition, bucket) — every bucket sorts in
  *      parallel on its own reducer;
  *   3. count rows per (partition, bucket) — a BOUNDED table (partitions ×
  *      buckets rows at any corpus size) — prefix-sum it into per-bucket
  *      offsets, broadcast, and add: `rn = local_rank + bucket_offset`.
  *
  * The only partition-less (or low-cardinality-partitioned) window left
  * runs on the aggregated offsets table, which is bounded by construction —
  * exactly the SCALING.md invariant ("global windows only on aggregated
  * series"). First landed inline in x118's sorted-neighborhood dedup
  * (`Dedup.scala`); factored here in round 9 so x53 / x35 / x94 share one
  * definition (VERDICT r8 items 1–3).
  */
object Ranks {

  /** Adds `rnName` = 1-based rank over `orderCols` within each `partCols`
    * group, computed distributedly. `bkt` must be an order-preserving,
    * bounded-cardinality function of the LEADING order column (rows with
    * equal leading keys must get equal buckets). The result column is
    * LongType; cast at the call site if the declared schema needs int.
    */
  def twoPassRank(df: DataFrame, partCols: Seq[String], bkt: Column,
      orderCols: Seq[Column], rnName: String = "rn"): DataFrame = {
    val keyed = df.withColumn("__bkt", bkt)
    val keyCols = partCols :+ "__bkt"
    val local = keyed.withColumn("__lrn", row_number().over(
      Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))
    // per-(partition, bucket) counts → running offset; bounded table, so
    // the prefix window is cheap no matter the corpus size
    val offs = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(
          Window.partitionBy(partCols.map(col): _*).orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keyCols.map(col) :+ col("__off")): _*)
    local.join(broadcast(offs), keyCols)
      .withColumn(rnName, col("__lrn") + col("__off"))
      .drop("__bkt", "__lrn")
  }

  /** TWO-PASS DISTRIBUTED PREFIX SUM — [[twoPassRank]]'s shape with a
    * running `sum(valCol)` instead of a row count: local cumulative sums
    * within each (partition, bucket) run in parallel, the per-bucket
    * TOTALS (a bounded table) prefix-sum into offsets, broadcast, add.
    * `orderCols` must be a total order (ties would make the row-based
    * running sum nondeterministic); `bkt` as in [[twoPassRank]]. The
    * result column is the INCLUSIVE prefix sum. */
  def twoPassCumsum(df: DataFrame, partCols: Seq[String], bkt: Column,
      orderCols: Seq[Column], valCol: Column,
      outName: String = "cum"): DataFrame = {
    val keyed = df.withColumn("__bkt", bkt).withColumn("__v", valCol)
    val keyCols = partCols :+ "__bkt"
    val local = keyed.withColumn("__lcs", sum(col("__v")).over(
      Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, 0)))
    val offs = keyed.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__v")).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(
          Window.partitionBy(partCols.map(col): _*).orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keyCols.map(col) :+ col("__off")): _*)
    local.join(broadcast(offs), keyCols)
      .withColumn(outName, col("__lcs") + col("__off"))
      .drop("__bkt", "__lcs", "__v", "__off")
  }

  /** Order-preserving bucket for a DOUBLE order key with UNKNOWN range,
    * derived from the value's binary exponent — no bounds pass needed:
    * positives map to 2000 + ⌊log₂ v⌋ (∈ [926, ~3024]), zero to 0,
    * negatives mirror below zero, so bucket order == value order
    * (non-strictly: equal values share a bucket) and cardinality is
    * bounded by the double exponent range (~4200) at ANY data scale.
    * The bucket value is internal — it never reaches an oracle-compared
    * column, so the libm log is parity-safe.
    */
  def expBucket(v: Column): Column =
    when(v === 0, lit(0))
      .when(v > 0, lit(2000) + floor(log(2.0, v)))
      .otherwise(lit(-2000) - floor(log(2.0, -v)))
      .cast("int")

  /** DISTRIBUTED RANK SELECTION — the row at a target rank per
    * `partCols` group, WITHOUT ranking (sorting) any row outside the
    * bucket that holds it: one hash aggregate builds the per-(group,
    * bucket) histogram; the group total `n`, the target rank
    * `kOfN(n)`, and the holding bucket's offset all derive from that
    * BOUNDED table; only the holding bucket's rows get a local
    * row_number, and the survivor at local rank `k − offset` is the
    * answer. Two data passes total (histogram + probe), a sort of ONE
    * bucket per group — the classic distributed selection shape,
    * strictly cheaper than [[twoPassRank]] (which sorts every bucket)
    * when only specific ranks are consumed (x94's medians).
    */
  def rankSelect(df: DataFrame, partCols: Seq[String], bkt: Column,
      orderCols: Seq[Column], kOfN: Column => Column): DataFrame = {
    val keyed = df.withColumn("__bkt", bkt)
    val keyCols = partCols :+ "__bkt"
    val sel = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(partCols.map(col): _*)))
      .withColumn("__k", kOfN(col("__n")))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(
          Window.partitionBy(partCols.map(col): _*).orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__off") < col("__k") &&
        col("__k") <= col("__off") + col("__c"))
      .select((keyCols.map(col) :+ col("__off") :+ col("__k")): _*)
    keyed.join(broadcast(sel), keyCols) // prunes to the holding buckets
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))
      .filter(col("__lrn") === col("__k") - col("__off"))
      .drop("__bkt", "__k", "__off", "__lrn")
  }
}
