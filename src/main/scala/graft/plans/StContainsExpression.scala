package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for point-in-polygon containment — the
  * codegen upgrade of [[graft.functions.Geo.stContains]] (SURVEY.md §7.3:
  * "UDF first, Expression w/ doGenCode later").
  *
  * Even-odd ray casting over a closed ring of struct<x:double,y:double>.
  * Unlike the Scala UDF, this participates in whole-stage codegen: the
  * generated Java loop reads the ring straight from Tungsten `ArrayData`
  * with no Row/Seq conversion, no serialization boundary — the difference
  * between a deserialization per probe and a tight loop at 100 TB probe
  * counts.
  */
case class StContains(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_contains_ring"

  override def nullSafeEval(ringAny: Any, xAny: Any, yAny: Any): Any = {
    val ring = ringAny.asInstanceOf[ArrayData]
    val x = xAny.asInstanceOf[Double]
    val y = yAny.asInstanceOf[Double]
    var inside = false
    val n = ring.numElements()
    var i = 0
    var j = n - 1
    while (i < n) {
      val pi = ring.getStruct(i, 2)
      val pj = ring.getStruct(j, 2)
      val xi = pi.getDouble(0); val yi = pi.getDouble(1)
      val xj = pj.getDouble(0); val yj = pj.getDouble(1)
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ring, x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val pi = ctx.freshName("pi")
      val pj = ctx.freshName("pj")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj"); val yj = ctx.freshName("yj")
      s"""
         |boolean ${ev.value}_inside = false;
         |int $n = $ring.numElements();
         |int $j = $n - 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  InternalRow $pi = $ring.getStruct($i, 2);
         |  InternalRow $pj = $ring.getStruct($j, 2);
         |  double $xi = $pi.getDouble(0); double $yi = $pi.getDouble(1);
         |  double $xj = $pj.getDouble(0); double $yj = $pj.getDouble(1);
         |  if ((($yi > $y) != ($yj > $y)) &&
         |      $x < ($xj - $xi) * ($y - $yi) / ($yj - $yi) + $xi) {
         |    ${ev.value}_inside = !${ev.value}_inside;
         |  }
         |  $j = $i;
         |}
         |${ev.value} = ${ev.value}_inside;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object StContains {
  /** Column-API surface. */
  def apply(ring: Column, x: Column, y: Column): Column =
    ColumnBridge.column(StContains(
      ColumnBridge.expr(ring), ColumnBridge.expr(x), ColumnBridge.expr(y)))

  /** Register as a SQL function (`SELECT st_contains_ring(ring, x, y)`). */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "st_contains_ring",
      exprs => StContains(exprs(0), exprs(1), exprs(2)))
}

/** Multi-ring / multi-polygon containment: even-odd ray casting summed
  * across ALL rings of an `array<array<struct<x,y>>>` — outer rings and
  * holes need no distinction (PostGIS `ST_Contains` semantics: a point
  * inside a hole crosses the outer ring once and the hole ring once →
  * even → outside; a point in any disjoint part of a MULTIPOLYGON crosses
  * its outer ring an odd number of times → inside). Same Tungsten
  * `ArrayData` codegen shape as [[StContains]], one extra loop level —
  * this is the full reference semantics (etl.py:119-128 emits true
  * MULTIPOLYGONs; queries.py:59 probes them with ST_Contains).
  */
case class StContainsRings(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_contains_rings"

  override def nullSafeEval(ringsAny: Any, xAny: Any, yAny: Any): Any = {
    val rings = ringsAny.asInstanceOf[ArrayData]
    val x = xAny.asInstanceOf[Double]
    val y = yAny.asInstanceOf[Double]
    var inside = false
    var r = 0
    val nr = rings.numElements()
    while (r < nr) {
      val ring = rings.getArray(r)
      val n = ring.numElements()
      var i = 0
      var j = n - 1
      while (i < n) {
        val pi = ring.getStruct(i, 2)
        val pj = ring.getStruct(j, 2)
        val xi = pi.getDouble(0); val yi = pi.getDouble(1)
        val xj = pj.getDouble(0); val yj = pj.getDouble(1)
        if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
          inside = !inside
        j = i
        i += 1
      }
      r += 1
    }
    inside
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (rings, x, y) => {
      val r = ctx.freshName("r")
      val nr = ctx.freshName("nr")
      val ring = ctx.freshName("ring")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val pi = ctx.freshName("pi")
      val pj = ctx.freshName("pj")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj"); val yj = ctx.freshName("yj")
      s"""
         |boolean ${ev.value}_inside = false;
         |int $nr = $rings.numElements();
         |for (int $r = 0; $r < $nr; $r++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $ring = $rings.getArray($r);
         |  int $n = $ring.numElements();
         |  int $j = $n - 1;
         |  for (int $i = 0; $i < $n; $i++) {
         |    InternalRow $pi = $ring.getStruct($i, 2);
         |    InternalRow $pj = $ring.getStruct($j, 2);
         |    double $xi = $pi.getDouble(0); double $yi = $pi.getDouble(1);
         |    double $xj = $pj.getDouble(0); double $yj = $pj.getDouble(1);
         |    if ((($yi > $y) != ($yj > $y)) &&
         |        $x < ($xj - $xi) * ($y - $yi) / ($yj - $yi) + $xi) {
         |      ${ev.value}_inside = !${ev.value}_inside;
         |    }
         |    $j = $i;
         |  }
         |}
         |${ev.value} = ${ev.value}_inside;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object StContainsRings {
  /** Column-API surface. */
  def apply(rings: Column, x: Column, y: Column): Column =
    ColumnBridge.column(StContainsRings(
      ColumnBridge.expr(rings), ColumnBridge.expr(x), ColumnBridge.expr(y)))

  /** Register as a SQL function (`SELECT st_contains_rings(rings, x, y)`). */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "st_contains_rings",
      exprs => StContainsRings(exprs(0), exprs(1), exprs(2)))
}
