package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two `array<double>` columns — the
  * codegen upgrade of `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * (SURVEY.md §7.3 preference order: compose built-ins first, native
  * Expression when the hot path needs it).
  *
  * Spark's higher-order functions allocate a lambda frame per element and
  * evaluate interpreted (no `doGenCode`), so a 64-dim dot product costs 128
  * boxed lambda calls per row. This expression is one fused Java loop over
  * Tungsten `ArrayData` inside whole-stage codegen — the difference between
  * interpreted per-element dispatch and a vectorizable multiply-accumulate
  * at 100 TB × 64-dim similarity scans.
  *
  * Semantics pinned to the HOF composition it replaces (bit-for-bit, see
  * VecDotSpec): strict left-to-right accumulation order (same FP result),
  * NULL when either array is NULL, when lengths differ (zip_with pads with
  * NULL, and 0.0 + NULL folds to NULL), or when any element is NULL.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // Conditionally null even when both children are non-nullable (ragged
  // lengths, null elements): without this override BinaryExpression reports
  // left.nullable || right.nullable, so over two non-null literals/arrays
  // nullSafeCodeGen would take its non-nullable branch, emit
  // `ev.isNull = true` against an undeclared isNull (Janino failure →
  // interpreted fallback) and let the optimizer mis-fold IsNull(vec_dot).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-API surface. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  /** Register as a SQL function (`SELECT vec_dot(a, b)`). */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "vec_dot",
      exprs => VecDot(exprs(0), exprs(1)))
}
