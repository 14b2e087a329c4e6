package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over numeric arrays (float or double elements),
  * accumulating in double in ELEMENT ORDER — the same sequential fold as
  * `aggregate(zip_with(a, b, *), 0.0, +)` and DuckDB's `list_reduce`, so
  * results are bit-identical to both (oracle-safe) while staying inside
  * whole-stage codegen. The interpreted higher-order-function pipeline
  * costs ~10x on pair-scoring hot paths (NOTES.md); this is the
  * embedding analog of the text signature kernels.
  *
  * Length mismatch yields NULL (zip_with would null-pad to the same
  * effect); NULL input yields NULL; a NULL *element* on either side also
  * yields NULL — `zip_with(a, b, *)` produces a null product there and
  * the `aggregate` fold propagates it, so the kernel must match.
  */
/** Packed hyperplane-sign signature: bit i of the result is 1 iff
  * `vec . planes[i] >= 0`. One kernel call computes every plane's dot in
  * a single loop nest over a constant-folded plane matrix — replacing
  * per-plane `CreateArray` + dot expressions, whose generated code at 64
  * planes x 64 dims blows past JIT method limits and runs ~100x slower
  * (NOTES.md round 3). Accumulation is element-order double addition,
  * identical to DotVec, so sign decisions (and thus LSH buckets/bands)
  * are bit-for-bit unchanged.
  *
  * `planes` must be a foldable array<array<double>> literal; at most 64
  * planes (one bit each). NULL vector -> NULL.
  */
case class SignBits(vec: Expression, planes: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = planes

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val planesOk = planes.foldable && (planes.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (!vecOk) TypeCheckResult.TypeCheckFailure(
      s"sign_bits requires array<float|double> vector, got ${vec.dataType.catalogString}")
    else if (!planesOk) TypeCheckResult.TypeCheckFailure(
      "sign_bits requires a foldable array<array<double>> plane matrix")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType

  @transient private lazy val planeMat: Array[Array[Double]] = {
    val arr = planes.eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toDoubleArray()
    }
    require(m.length <= 64, s"sign_bits supports at most 64 planes, got ${m.length}")
    m
  }

  @transient private lazy val isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, p: Any): Any =
    SignBits.compute(v.asInstanceOf[ArrayData], planeMat, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planeMat", planeMat, "double[][]")
    val fl = if (isFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.SignBits.compute($v, $matRef, $fl);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBits =
    copy(vec = newLeft, planes = newRight)

  override def prettyName: String = "sign_bits"
}

object SignBits {
  // the planes re-read every element P times otherwise, each through
  // the ArrayData accessor (~20 ns/element — the r12 kernel lesson);
  // extraction preserves the exact doubles and fold order
  private val vecScratch = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](0)
  }

  /** All-planes sign computation in one loop nest; element-order double
    * accumulation matches DotVec exactly.
    */
  def compute(v: ArrayData, planes: Array[Array[Double]],
      isFloat: Boolean): Long = {
    val n = v.numElements()
    var q = vecScratch.get()
    if (q.length < n) { q = new Array[Double](n); vecScratch.set(q) }
    var i = 0
    if (isFloat) {
      while (i < n) { q(i) = v.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { q(i) = v.getDouble(i); i += 1 }
    }
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val d = math.min(n, pl.length)
      var acc = 0.0
      i = 0
      while (i < d) { acc += q(i) * pl(i); i += 1 }
      if (acc >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}

case class DotVec(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_vec requires array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  // nullable regardless of child nullability: length mismatch yields NULL
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lt = elemType(left).get
    val rt = elemType(right).get
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = (t: DataType, arr: String, i: String) =>
      if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val lt = elemType(left).get
    val rt = elemType(right).get
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
         |    $acc += ${get(lt, a, i)} * ${get(rt, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotVec =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_vec"
}
