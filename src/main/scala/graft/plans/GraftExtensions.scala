package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: installs the engine's native
  * functions at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * This is the deployment-grade registration path (survives `newSession()`,
  * no per-session imperative registration); [[StContains.register]] remains
  * for ad-hoc sessions the caller didn't build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("st_contains_ring"),
      new ExpressionInfo(classOf[StContains].getName, "st_contains_ring"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        StContains(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("st_contains_rings"),
      new ExpressionInfo(classOf[StContainsRings].getName, "st_contains_rings"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        StContainsRings(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    // zorder(a, b): 8+8-bit Morton interleave, composed from built-in
    // bitwise expressions (no custom eval needed — the SQL surface for
    // PhysicalDesign.zValue, same semantics because it builds the same
    // operator tree).
    e.injectFunction((
      new FunctionIdentifier("zorder"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "zorder"),
      ZOrderSql.build))
    // st_dwithin(lat1, lon1, lat2, lon2, r_km): ST_DWithin whose expansion
    // carries a sound latitude-band conjunct (scan-pushable when the probe
    // point is literal) ahead of the exact haversine test.
    e.injectFunction((
      new FunctionIdentifier("st_dwithin"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "st_dwithin"),
      StDWithinSql.build))
    // cdc_boundaries(text, w, every): content-defined chunk end positions
    // via the codegen'd gear-hash loop (w and every must be literals —
    // they parameterize the generated code)
    e.injectFunction((
      new FunctionIdentifier("cdc_boundaries"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "cdc_boundaries"),
      CdcBoundariesSql.build))
    // optimizer rule: threshold levenshtein predicates run the banded DP
    e.injectOptimizerRule(_ => LevenshteinThresholdRewrite)
    // physical strategy: TopKPerGroupNode plans as partial/final bounded
    // heaps (the per-group TakeOrderedAndProject Spark lacks)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

/** The `zorder(a, b)` SQL function body, shared by the extension injection
  * and per-session registration. */
object ZOrderSql {
  import org.apache.spark.sql.catalyst.expressions._

  val build: Seq[Expression] => Expression = { exprs =>
    def term(i: Int): Expression = BitwiseOr(
      ShiftLeft(BitwiseAnd(ShiftRight(exprs(0), Literal(i)), Literal(1L)),
        Literal(2 * i + 1)),
      ShiftLeft(BitwiseAnd(ShiftRight(exprs(1), Literal(i)), Literal(1L)),
        Literal(2 * i)))
    (0 until 8).map(term).reduce(BitwiseOr(_, _))
  }

  /** Register as a SQL function (`SELECT zorder(a, b)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "zorder", build)
}
