package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graft.{shims => ExpressionUtils}

/** Hilbert-curve index of a 2-D cell — the other space-filling curve
  * used for multi-dimensional data clustering (Delta/Iceberg OPTIMIZE
  * offer both). Unlike the Z-curve's bit interleave, the Hilbert walk
  * never jumps across the space, so consecutive index ranges are tighter
  * rectangles and box-predicate file pruning skips at least as many
  * files on average.
  *
  * xy2d is the standard reflect-and-rotate loop (Hamilton's convention,
  * the Wikipedia spelling): per level s = 2^i the quadrant id
  * (3·rx) xor ry is accumulated at weight s², then the lower quadrant is
  * reflected/swapped into canonical orientation. The loop is
  * data-dependent (branchy swaps), so it lives here as a native
  * codegen'd expression — as a Column `when`-tree its size would grow
  * ~4× per level.
  *
  * Inputs must already be normalized to [0, 2^bits); the Lake.hvalue2
  * wrapper does the linear scaling exactly like zvalue2.
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the lower quadrant
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert {
  /** Hilbert index of two long columns already in [0, 2^bits). */
  def index2(a: Column, b: Column, bits: Int): Column =
    ExpressionUtils.column(HilbertIndex2(
      ExpressionUtils.expression(a.cast("long")),
      ExpressionUtils.expression(b.cast("long")), bits))
}
