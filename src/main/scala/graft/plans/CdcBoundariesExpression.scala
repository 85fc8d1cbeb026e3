package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for CONTENT-DEFINED chunk boundaries (the
  * FastCDC/rsync gear-hash family) — the codegen upgrade of x92's
  * higher-order-function pipeline, the same "UDF/HOF first, Expression
  * w/ doGenCode later" path [[StContains]] took (SURVEY.md §7.3).
  *
  * Semantics (bit-for-bit the x92 DuckDB oracle's): over 1-based char
  * positions, a position `i ≥ w` is a cut when the polynomial hash of the
  * trailing `w`-char window — Σ code(c_j)·31^(i−j), one mod 1e9+7 at the
  * end — is ≡ 0 mod `every`. The returned array is the chunk END
  * positions: the cuts, plus the document length if the last cut didn't
  * land there (`n < w` degenerates to the single extent `[n]`).
  *
  * Why native: the HOF form interprets ~n·w lambda nodes per document
  * (measured 5.2 s at sf0.1); this loop participates in whole-stage
  * codegen and reads chars straight off the decoded string. At 100 TB the
  * operator is a pure scan-side pass either way — the Expression keeps it
  * inside the codegen'd stage so chunking runs at scan bandwidth.
  *
  * Char codes are UTF-16 units (`String.charAt`), which equal codepoints
  * on the BMP — the same values `ascii()`/DuckDB `unicode()` produce for
  * the corpus's single-unit chars (the [[graft.functions.Text.charHash]]
  * parity contract).
  */
case class CdcBoundaries(child: Expression, w: Int, every: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val tmp = new Array[Int](n + 1)
    var m = 0
    if (n < w) { tmp(m) = n; m += 1 }
    else {
      var i = w
      while (i <= n) {
        var h = 0L
        var k = i - w
        while (k < i) { h = h * 31L + s.charAt(k); k += 1 }
        if (h % 1000000007L % every == 0L) { tmp(m) = i; m += 1 }
        i += 1
      }
      if (m == 0 || tmp(m - 1) != n) { tmp(m) = n; m += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(tmp, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val tmp = ctx.freshName("tmp")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $input.toString();
         |int $n = $s.length();
         |int[] $tmp = new int[$n + 1];
         |int $m = 0;
         |if ($n < $w) { $tmp[$m++] = $n; }
         |else {
         |  for (int $i = $w; $i <= $n; $i++) {
         |    long $h = 0L;
         |    for (int $k = $i - $w; $k < $i; $k++) {
         |      $h = $h * 31L + $s.charAt($k);
         |    }
         |    if ($h % 1000000007L % $every == 0L) { $tmp[$m++] = $i; }
         |  }
         |  if ($m == 0 || $tmp[$m - 1] != $n) { $tmp[$m++] = $n; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($tmp, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Column-API surface. */
  def apply(text: Column, w: Int, every: Int): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expr(text), w, every))
}

/** The `cdc_boundaries(text, w, every)` SQL function body, shared by the
  * extension injection and per-session registration. The window width and
  * cut divisor parameterize the GENERATED code, so they must be foldable
  * integer literals at the call site. */
object CdcBoundariesSql {
  val build: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, "cdc_boundaries(text, w, every)")
    def lit(e: Expression, what: String): Int = {
      require(e.foldable, s"cdc_boundaries: $what must be a literal")
      e.eval().asInstanceOf[Number].intValue
    }
    CdcBoundaries(exprs.head, lit(exprs(1), "w"), lit(exprs(2), "every"))
  }

  /** Register as a SQL function (`SELECT cdc_boundaries(text, 4, 32)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "cdc_boundaries", build)
}
