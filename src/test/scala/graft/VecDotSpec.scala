package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VecDot

/** Pins [[graft.plans.VecDot]] to the HOF composition it replaced:
  * bit-identical values (same left-to-right accumulation), identical NULL
  * semantics, and participation in whole-stage codegen (the point of the
  * native expression). */
class VecDotSpec extends AnyFunSuite {
  import SparkTestSession._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private val schema = StructType(Seq(
    StructField("a", ArrayType(DoubleType, containsNull = true)),
    StructField("b", ArrayType(DoubleType, containsNull = true))))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  test("bit-identical to aggregate(zip_with) on dense vectors") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(Row(
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val out = df(rows)
      .select(VecDot(col("a"), col("b")).as("native"), hofDot.as("hof"))
      .collect()
    out.foreach { r =>
      // exact bit equality, not tolerance — the accumulation order is pinned
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null semantics match the HOF: null array, ragged lengths, null element") {
    val rows = Seq(
      Row(null, Seq(1.0, 2.0)),
      Row(Seq(1.0, 2.0), null),
      Row(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)), // zip_with pads -> null sum
      Row(Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)), // null element -> null
      Row(Seq.empty[Any], Seq.empty[Any]), // empty x empty -> 0.0
      Row(Seq(2.0, 3.0), Seq(4.0, 5.0)))
    val out = df(rows)
      .select(VecDot(col("a"), col("b")).as("native"), hofDot.as("hof"))
      .collect()
    out.foreach { r => assert(r.isNullAt(0) === r.isNullAt(1), r.toString) }
    assert(out(4).getDouble(0) === 0.0)
    assert(out(5).getDouble(0) === 23.0)
  }

  test("interpreted eval path agrees with codegen path") {
    // force the interpreted path via the expression's eval on literals
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = VecDot(
      Literal.create(Seq(1.5, -2.0, 0.25), ArrayType(DoubleType)),
      Literal.create(Seq(4.0, 0.5, 8.0), ArrayType(DoubleType)))
    assert(e.eval(null) === (1.5 * 4.0 + -2.0 * 0.5 + 0.25 * 8.0))
  }

  test("vec_dot runs inside whole-stage codegen") {
    val q = df(Seq(Row(Seq(1.0, 2.0), Seq(3.0, 4.0))))
      .select(VecDot(col("a"), col("b")).as("d"))
    q.collect()
    val stages = PlanWalk.collectAll(q.queryExecution.executedPlan).collect {
      case w: WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("vec_dot")),
      q.queryExecution.executedPlan.toString)
  }

  test("non-nullable children still compile and honor conditional nulls") {
    // CreateArray over literals is non-nullable on both sides: without the
    // nullable=true override, codegen hits the non-nullable branch and the
    // ragged-length `isNull = true` assignment fails to compile (ADVICE r03)
    val q = spark.range(1).select(
      VecDot(array(lit(1.0), lit(2.0), lit(3.0)),
        array(lit(4.0), lit(5.0))).as("ragged"),
      VecDot(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("dense"),
      VecDot(array(lit(1.0)), array(lit(2.0))).isNull.as("is_null_folded"))
    val r = q.collect().head
    assert(r.isNullAt(0), "ragged non-nullable inputs must yield NULL")
    assert(r.getDouble(1) === 11.0)
    assert(r.getBoolean(2) === false)
    // the expression must still report nullable so IsNull isn't mis-folded
    assert(q.schema("ragged").nullable)
  }

  test("SQL registration") {
    VecDot.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()
    assert(r.head.getDouble(0) === 11.0)
  }
}
