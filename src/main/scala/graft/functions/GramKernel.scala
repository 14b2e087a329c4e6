package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** gram_rows(f, y): the per-document sufficient-statistic rows of the
  * linear-probe normal equations ([[graft.operators.MlOps.gramStats]])
  * as one native kernel — upper-triangle feature products
  * (i <= j by bucket value, self-pairs once) plus the j = -1 moment
  * rows (cnt * y). Semantically identical to the
  * transform/filter/flatten lambda pipeline it replaces, but codegen'd:
  * higher-order lambdas run interpreted per row (the NOTES hot-path
  * rule), and this explosion emits ~(F^2/2 + F) structs per document.
  */
object GramKernel {
  val RowType: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false)))

  def rows(f: ArrayData, y: Long): ArrayData = {
    val n = f.numElements()
    val bs = new Array[Int](n)
    val cs = new Array[Long](n)
    var idx = 0
    while (idx < n) {
      val r = f.getStruct(idx, 2)
      bs(idx) = r.getInt(0)
      cs(idx) = r.getLong(1)
      idx += 1
    }
    val out = new Array[Any](n * (n + 1) / 2 + n)
    var o = 0
    var a = 0
    while (a < n) {
      var b = a
      while (b < n) {
        val (i, j) = if (bs(a) <= bs(b)) (bs(a), bs(b)) else (bs(b), bs(a))
        out(o) = new GenericInternalRow(
          Array[Any](i, j, cs(a) * cs(b)))
        o += 1
        b += 1
      }
      out(o) = new GenericInternalRow(Array[Any](bs(a), -1, cs(a) * y))
      o += 1
      a += 1
    }
    new GenericArrayData(out)
  }
}

case class GramRows(feats: Expression, label: Expression)
    extends BinaryExpression {
  override def left: Expression = feats
  override def right: Expression = label

  override def checkInputDataTypes(): TypeCheckResult =
    (feats.dataType, label.dataType) match {
      case (ArrayType(s: StructType, _), LongType)
        if s.length == 2 && s(0).dataType == IntegerType &&
          s(1).dataType == LongType => TypeCheckResult.TypeCheckSuccess
      case (ft, lt) => TypeCheckResult.TypeCheckFailure(
        "gram_rows requires (array<struct<bucket int, cnt bigint>>, " +
          s"bigint), got (${ft.sql}, ${lt.sql})")
    }

  override def dataType: DataType =
    ArrayType(GramKernel.RowType, containsNull = false)

  override def nullSafeEval(f: Any, y: Any): Any =
    GramKernel.rows(f.asInstanceOf[ArrayData], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, y) =>
      s"${ev.value} = graft.functions.GramKernel.rows($f, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GramRows =
    copy(feats = newLeft, label = newRight)
  override def prettyName: String = "gram_rows"
}
