package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (the IVF-PQ pipeline's hot path,
  * `operators/SimilarityOps`). Composing these out of per-subspace
  * `slice`/`CreateArray`/`dot_vec`/`array_position` expressions builds an
  * M*K-literal tree whose generated code takes seconds to JIT and then
  * evaluates interpreted — the SignBits lesson (NOTES.md round 3) at PQ
  * scale. Each kernel is one loop nest over a constant-folded codebook
  * with element-order double accumulation, bit-identical to the
  * expression tree it replaces:
  *
  *  - [[PqEncode]]: per-subspace FIRST-argmax of `dot(sub, c) - |c|^2/2`
  *    (the `array_position(scores, array_max(scores))` tie rule).
  *  - [[PqAdc]]: asymmetric distance — sum over subspaces of the query
  *    sub-vector dotted with the centroid selected by the stored code.
  *  - [[CellDists]]: per-centroid comparison keys `|c|^2 - 2 x.c`
  *    (orders identically to squared distance; callers argmin/rank).
  *
  * Codebook/centroid arguments must be foldable array literals; the
  * half-norm / norm terms are folded at materialization in the same
  * index-order sum the literal expressions used.
  */
object PqKernels {

  private[functions] def vecOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private[functions] def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private[functions] def toBooks(e: Expression): Array[Array[Array[Double]]] = {
    val arr = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { mi =>
      val sub = arr.getArray(mi)
      Array.tabulate(sub.numElements())(k => sub.getArray(k).toDoubleArray())
    }
  }

  private def get(v: ArrayData, i: Int, float: Boolean): Double =
    if (float) v.getFloat(i).toDouble else v.getDouble(i)

  /** First-argmax encode; returns null when the vector length is not
    * M * subDim.
    */
  def encode(v: ArrayData, books: Array[Array[Array[Double]]],
      halfNorms: Array[Array[Double]], float: Boolean): ArrayData = {
    val m = books.length
    if (m == 0) return new GenericArrayData(Array.empty[Int])
    val sub = books(0)(0).length
    val n = m * sub
    if (v.numElements() != n) return null
    // extract once: the scan reads every element K (=book size) times
    // otherwise, each through the ~20 ns ArrayData accessor (same fix
    // as cellDists below — identical doubles, identical fold order)
    var q = vecScratch.get()
    if (q.length < n) { q = new Array[Double](n); vecScratch.set(q) }
    var j = 0
    while (j < n) { q(j) = get(v, j, float); j += 1 }
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * sub
      val book = books(mi)
      var best = 0
      var bestScore = Double.NegativeInfinity
      var k = 0
      while (k < book.length) {
        val c = book(k)
        var acc = 0.0
        var i = 0
        while (i < sub) { acc += q(base + i) * c(i); i += 1 }
        val score = acc - halfNorms(mi)(k)
        if (score > bestScore) { bestScore = score; best = k }
        k += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC: sum over subspaces of dot(query sub-vector, selected
    * centroid); null on bad code / length.
    */
  def adc(q: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Double]]], float: Boolean): Any = {
    val m = books.length
    if (m == 0) return 0.0
    val sub = books(0)(0).length
    if (q.numElements() != m * sub || codes.numElements() != m) return null
    var total = 0.0
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val k = codes.getInt(mi)
      val book = books(mi)
      if (k < 0 || k >= book.length) return null
      val c = book(k)
      val base = mi * sub
      var acc = 0.0
      var i = 0
      while (i < sub) { acc += get(q, base + i, float) * c(i); i += 1 }
      total += acc
      mi += 1
    }
    total
  }

  /** Per-centroid comparison keys |c|^2 - 2 x.c in one loop nest. */
  // row-vector extraction buffer: the per-element ArrayData accessor
  // (virtual call + float/double branch) costs ~20 ns/element — at
  // k x dim accessor calls per row it WAS the scan wall (see
  // CoarseKernels.assignCoarse, same fix). Values are bit-identical:
  // the same doubles flow through the same multiply-add order.
  private val vecScratch = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](0)
  }

  def cellDists(v: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], float: Boolean): ArrayData = {
    val out = new Array[Double](cents.length)
    val n = v.numElements()
    var q = vecScratch.get()
    if (q.length < n) { q = new Array[Double](n); vecScratch.set(q) }
    var i = 0
    while (i < n) { q(i) = get(v, i, float); i += 1 }
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val d = math.min(n, ct.length)
      var acc = 0.0
      i = 0
      while (i < d) { acc += q(i) * ct(i); i += 1 }
      out(c) = norms(c) - 2.0 * acc
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** pq_encode(vec, books): array<int> PQ codes. `books` must be a
  * foldable array<array<array<double>>> literal (M x K x subDim).
  */
case class PqEncode(vec: Expression, books: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = books

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PqKernels.vecOk(vec)) TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double> vector, got ${vec.dataType.catalogString}")
    else if (!books.foldable || (books.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => false
      case _ => true
    })) TypeCheckResult.TypeCheckFailure(
      "pq_encode requires a foldable array<array<array<double>>> codebook")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val bookMat = PqKernels.toBooks(books)
  // |c|^2 / 2 folded once, index-order sum (matches the literal tree)
  @transient private lazy val halfNorms: Array[Array[Double]] =
    bookMat.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s / 2
    })
  @transient private lazy val fl = PqKernels.isFloat(vec)

  override def nullSafeEval(v: Any, b: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], bookMat, halfNorms, fl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("pqBooks", bookMat, "double[][][]")
    val hRef = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[][]")
    val flS = if (fl) "true" else "false"
    nullSafeCodeGen(ctx, ev, (v, _) => s"""
       |${ev.value} = graft.functions.PqKernels.encode($v, $bRef, $hRef, $flS);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vec = newLeft, books = newRight)
  override def prettyName: String = "pq_encode"
}

/** pq_adc(query_vec, codes, books): double ADC score. */
case class PqAdc(qvec: Expression, codes: Expression, books: Expression)
    extends TernaryExpression {
  override def first: Expression = qvec
  override def second: Expression = codes
  override def third: Expression = books

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PqKernels.vecOk(qvec)) TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires array<float|double> query vector, got ${qvec.dataType.catalogString}")
    else if (codes.dataType match {
      case ArrayType(IntegerType, _) => false
      case _ => true
    }) TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires array<int> codes, got ${codes.dataType.catalogString}")
    else if (!books.foldable || (books.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => false
      case _ => true
    })) TypeCheckResult.TypeCheckFailure(
      "pq_adc requires a foldable array<array<array<double>>> codebook")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val bookMat = PqKernels.toBooks(books)
  @transient private lazy val fl = PqKernels.isFloat(qvec)

  override def nullSafeEval(q: Any, c: Any, b: Any): Any =
    PqKernels.adc(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      bookMat, fl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("pqBooks", bookMat, "double[][][]")
    val flS = if (fl) "true" else "false"
    nullSafeCodeGen(ctx, ev, (q, c, _) => s"""
       |Object adcRes = graft.functions.PqKernels.adc($q, $c, $bRef, $flS);
       |if (adcRes == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) adcRes).doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PqAdc = copy(qvec = f, codes = s, books = t)
  override def prettyName: String = "pq_adc"
}

/** cell_dists(vec, cents): array<double> of |c|^2 - 2 x.c per centroid
  * (nearest-centroid comparison keys; `cents` a foldable
  * array<array<double>> literal).
  */
case class CellDists(vec: Expression, cents: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = cents

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PqKernels.vecOk(vec)) TypeCheckResult.TypeCheckFailure(
      s"cell_dists requires array<float|double> vector, got ${vec.dataType.catalogString}")
    else if (!cents.foldable || (cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => false
      case _ => true
    })) TypeCheckResult.TypeCheckFailure(
      "cell_dists requires a foldable array<array<double>> centroid matrix")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val centMat: Array[Array[Double]] = {
    val arr = cents.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
  }
  // |c|^2 folded once, index-order sum (matches lit(c.map(x*x).sum))
  @transient private lazy val norms: Array[Double] = centMat.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }
  @transient private lazy val fl = PqKernels.isFloat(vec)

  override def nullSafeEval(v: Any, c: Any): Any =
    PqKernels.cellDists(v.asInstanceOf[ArrayData], centMat, norms, fl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cellCents", centMat, "double[][]")
    val nRef = ctx.addReferenceObj("cellNorms", norms, "double[]")
    val flS = if (fl) "true" else "false"
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.PqKernels.cellDists($v, $cRef, $nRef, $flS);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellDists =
    copy(vec = newLeft, cents = newRight)
  override def prettyName: String = "cell_dists"
}
