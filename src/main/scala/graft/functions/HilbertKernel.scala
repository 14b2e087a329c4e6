package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D point — the layout key with strictly
  * better locality than the Morton interleave ([[graft.operators.ZOrder]]):
  * consecutive keys are ALWAYS Manhattan-adjacent cells (HilbertSpec
  * pins it), so range-partitioned files cover compact tiles with no
  * Z-shaped diagonal jumps.
  *
  * The classic xy2d state machine (quadrant + rotate, one step per
  * bit, public-domain construction from Hilbert 1891 as given in
  * Wikipedia/"Hacker's Delight"): pure int64 ops, so the key is
  * oracle-checkable exactly (DuckDB re-derives it with a recursive
  * CTE). Out-of-range inputs throw — same loud-failure contract as
  * zOrderKey (r11 ADVICE): a silently wrapped coordinate would write
  * a badly clustered 100 TB table.
  */
case class HilbertKey(x: Expression, y: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert_key: bits=$bits not in [1,31]")

  override def left: Expression = x
  override def right: Expression = y

  override def checkInputDataTypes(): TypeCheckResult =
    (x.dataType, y.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key requires (BIGINT, BIGINT), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertKernel.xy2d(bits, xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKernel.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertKey = copy(x = newLeft, y = newRight)

  override def prettyName: String = "hilbert_key"
}

object HilbertKernel {

  /** Hilbert index of (x, y) on the 2^bits x 2^bits grid. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    if (x0 < 0 || y0 < 0 || (x0 >> bits) != 0 || (y0 >> bits) != 0)
      throw new IllegalArgumentException(
        s"hilbert_key: point ($x0, $y0) outside [0, 2^$bits) — " +
          "rank-normalize the dimensions first")
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate quadrant
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse mapping (d -> point) — used by HilbertSpec to pin
    * bijectivity independently of [[xy2d]]'s loop.
    */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
