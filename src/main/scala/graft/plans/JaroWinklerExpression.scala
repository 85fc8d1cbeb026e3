package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler string similarity — the
  * record-linkage scorer the built-in `levenshtein` doesn't give (JW
  * weights shared prefixes and tolerates transpositions, the shape of
  * human-entered name/title variants). Spark ships no JW; the UDF form
  * would box two Strings per comparison. This participates in
  * whole-stage codegen: both paths call the single static kernel in
  * [[JaroWinklerAlgo]] on Tungsten `UTF8String`s — the fuzzy-join
  * verifier runs it on every blocked candidate pair, so the per-call
  * constant is the whole cost at 100 TB pair counts.
  *
  * Oracle parity: the kernel implements exactly DuckDB's
  * `jaro_winkler_similarity` variant (boost threshold 0.7, prefix cap
  * 4, p = 0.1, empty → 0) — pinned by JaroWinklerSpec's differential
  * test over random and adversarial pairs.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinklerAlgo.score($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(ColumnBridge.expr(a), ColumnBridge.expr(b)))
}
