package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native TOP-K-PER-GROUP — the whole-operator extension tier (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, SURVEY §7.3's option
  * (c)): keep the k best rows of every group under a total sort order.
  *
  * Spark has no physical operator for this shape. The declarative form —
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` — plans as
  * exchange + FULL SORT of every group + window walk; for k ≪ group size
  * almost all of that sort is wasted (global top-k gets a dedicated
  * `TakeOrderedAndProject` for exactly this reason; per-group top-k
  * doesn't). This operator keeps a bounded k-row heap per group, in two
  * phases mirroring partial/final aggregation:
  *
  *   partial TopKPerGroupExec   (per input partition, no distribution req)
  *        → Exchange(group)     (inserted by EnsureRequirements — rows
  *                               crossing the wire: ≤ k·groups·partitions,
  *                               not the whole input)
  *   final  TopKPerGroupExec    (requires ClusteredDistribution(group))
  *
  * Correctness: top-k of a union = top-k of the per-part top-k's (the
  * same merge identity x64's bottom-k sample pins); ties are the caller's
  * responsibility — pass a TOTAL order (tiebreak column) for
  * deterministic output, as the q88 oracle does. Partial-phase heap
  * memory is bounded at O(min(groups, budget)·k) per task — over
  * `spark.graft.topk.maxPartialGroups` (default 65536) live groups the
  * larger half of the heaps is flushed downstream for the final phase to
  * re-merge, so high-cardinality group keys degrade to pass-through
  * instead of OOM (the partial-hash-aggregate contract); never the sort
  * buffer's O(rows).
  *
  * Installed per-session via `spark.experimental.extraStrategies` (the
  * queries do this imperatively) or for all sessions via
  * [[GraftExtensions]]' `injectPlannerStrategy`.
  */
case class TopKPerGroupNode(
    group: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    group: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(group))

  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupAttrs = group
    val orderSpec = order
    val limit = k
    val childOutput = child.output
    // PARTIAL-phase group budget (VERDICT r06 #3): past this many live
    // groups the larger half of the heaps is flushed downstream and
    // evicted, so partial-state memory is bounded at O(budget·k) no
    // matter the group cardinality — the same spill-to-downstream escape
    // hatch partial hash aggregation has. Correctness is unaffected:
    // top-k of a union = top-k of per-chunk top-k's, and the final phase
    // re-merges everything it receives. Worst case (every key distinct)
    // degrades to pass-through, exactly like partial agg. The FINAL
    // phase never flushes — emitting more than k rows per group would
    // break the contract — and its envelope is groups/shufflePartitions
    // × k, the final-hash-aggregate envelope.
    val budget =
      if (partial)
        conf.getConfString("spark.graft.topk.maxPartialGroups", "65536").toInt
      else Int.MaxValue
    child.execute().mapPartitions { iter =>
      // codegen'd lexicographic comparator over the SortOrder spec:
      // "better" compares less (Descending is folded into the spec)
      val ord = GenerateOrdering.generate(orderSpec, childOutput)
      val groupProj = UnsafeProjection.create(groupAttrs, childOutput)
      // head of each heap = the WORST row currently kept (reverse order)
      val rev: java.util.Comparator[InternalRow] = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      import scala.jdk.CollectionConverters._

      new scala.collection.AbstractIterator[InternalRow] {
        private var flushed: Iterator[InternalRow] = Iterator.empty
        private var drained = false

        // evict the larger half of the live heaps — they hold the most
        // rows, so one flush frees the most memory; rows go downstream
        // where the final phase re-merges them
        private def flushHalf(): Iterator[InternalRow] = {
          val bySize = heaps.entrySet().iterator().asScala.toArray
            .sortBy(-_.getValue.size)
          val victims = bySize.take(math.max(1, bySize.length / 2))
          val rows = victims.flatMap(_.getValue.iterator().asScala)
          victims.foreach(e => heaps.remove(e.getKey))
          rows.iterator
        }

        override def hasNext: Boolean = {
          while (!flushed.hasNext && iter.hasNext) {
            val row = iter.next()
            val key = groupProj(row)
            var h = heaps.get(key)
            if (h == null) {
              if (heaps.size >= budget) flushed = flushHalf()
              h = new java.util.PriorityQueue[InternalRow](limit + 1, rev)
              heaps.put(key.copy(), h)
            }
            if (h.size < limit) h.add(row.copy())
            else if (ord.compare(row, h.peek) < 0) { h.poll(); h.add(row.copy()) }
          }
          if (!flushed.hasNext && !iter.hasNext && !drained) {
            drained = true
            flushed = heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
          }
          flushed.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          flushed.next()
        }
      }
    }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, child) =>
      val partial = TopKPerGroupExec(group, order, k, partial = true,
        planLater(child))
      TopKPerGroupExec(group, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** DataFrame surface: keep the k best rows per group. `orderCols` are
    * (name, descending) pairs forming the ranking order — pass a total
    * order (include a tiebreak) for deterministic results. */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      lp.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val order = orderCols.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), order, k, lp))
  }
}
