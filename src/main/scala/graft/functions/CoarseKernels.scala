package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Coarse-blocked EXACT nearest-centroid assignment (r11 verdict #7).
  *
  * At SemDeDup's prescribed composition k grows with the corpus, and
  * the flat O(n*k*dim) `cell_dists` scan becomes the wall (measured:
  * 259.8 s at k = 10000 on the 1000x sweep). The classic IVF fix made
  * exact: cluster the k centroids into m ~ sqrt(k) super-cells once
  * (driver/executor-local, O(k*m*dim)), then per row visit super-cells
  * in distance order and SKIP any super whose triangle-inequality
  * lower bound — d(x, s) minus the super's child radius — already
  * exceeds the best candidate found. Unlike IVF's nprobe this prunes
  * with a PROOF, so the returned cell is bit-identical to the flat
  * scan's argmin (same |c|^2 - 2 x.c comparison keys, same
  * first-index tie-break; the bound carries a 1e-9 relative slack so
  * double rounding can only ever prune LESS). MlOpsSpec pins equality
  * organically and at adversarial k.
  */
object CoarseKernels {

  /** Two-level index over a centroid matrix. Serializable — rides to
    * executors inside the expression's codegen references.
    */
  final case class CoarseIndex(
      supers: Array[Array[Double]],
      superNorms: Array[Double],
      children: Array[Array[Int]],
      radii: Array[Double])

  /** Deterministic mini-Lloyd's over the centroids themselves:
    * init = evenly strided centroids, 5 iterations, empty supers keep
    * their previous position. Pure driver-side doubles.
    */
  def buildIndex(cents: Array[Array[Double]], m0: Int): CoarseIndex = {
    val k = cents.length
    val m = math.max(1, math.min(m0, k))
    val dim = cents(0).length
    var supers = Array.tabulate(m)(i =>
      cents(((i.toLong * k) / m).toInt.min(k - 1)).clone())
    val assign = new Array[Int](k)
    var it = 0
    while (it < 5) {
      val sNorms = supers.map(s => { var a = 0.0; var i = 0
        while (i < dim) { a += s(i) * s(i); i += 1 }; a })
      var c = 0
      while (c < k) {
        var best = Double.MaxValue; var bi = 0; var s = 0
        while (s < m) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += cents(c)(i) * supers(s)(i); i += 1 }
          val key = sNorms(s) - 2.0 * dot
          if (key < best) { best = key; bi = s }
          s += 1
        }
        assign(c) = bi
        c += 1
      }
      val sums = Array.fill(m, dim)(0.0)
      val cnt = new Array[Long](m)
      c = 0
      while (c < k) {
        val s = assign(c); cnt(s) += 1; var i = 0
        while (i < dim) { sums(s)(i) += cents(c)(i); i += 1 }
        c += 1
      }
      supers = Array.tabulate(m)(s =>
        if (cnt(s) == 0) supers(s)
        else Array.tabulate(dim)(i => sums(s)(i) / cnt(s)))
      it += 1
    }
    val children = Array.tabulate(m)(s =>
      (0 until k).filter(assign(_) == s).toArray)
    val radii = Array.tabulate(m) { s =>
      var r = 0.0
      children(s).foreach { c =>
        var d2 = 0.0; var i = 0
        while (i < dim) {
          val d = cents(c)(i) - supers(s)(i); d2 += d * d; i += 1
        }
        r = math.max(r, math.sqrt(d2))
      }
      r
    }
    val superNorms = supers.map(s => { var a = 0.0; var i = 0
      while (i < s.length) { a += s(i) * s(i); i += 1 }; a })
    CoarseIndex(supers, superNorms, children, radii)
  }

  private def get(v: ArrayData, i: Int, float: Boolean): Double =
    if (float) v.getFloat(i).toDouble else v.getDouble(i)

  /** Exact argmin cell. Comparison key per candidate is EXACTLY
    * [[PqKernels.cellDists]]'s norms(c) - 2 x.c (same loop), so the
    * result matches the flat scan bit-for-bit, first-index ties
    * included.
    */
  def assignCoarse(v: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], idx: CoarseIndex, float: Boolean): Int = {
    val n = v.numElements()
    var xx = 0.0
    var i = 0
    while (i < n) { val x = get(v, i, float); xx += x * x; i += 1 }
    val m = idx.supers.length
    val ds = new Array[Double](m)
    val order = new Array[Int](m)
    var s = 0
    while (s < m) {
      val sp = idx.supers(s)
      val d = math.min(n, sp.length)
      var dot = 0.0; i = 0
      while (i < d) { dot += get(v, i, float) * sp(i); i += 1 }
      ds(s) = math.sqrt(math.max(0.0, xx + idx.superNorms(s) - 2.0 * dot))
      order(s) = s
      s += 1
    }
    // insertion sort by ds — m ~ sqrt(k) stays small
    s = 1
    while (s < m) {
      val o = order(s); val dv = ds(o); var j = s - 1
      while (j >= 0 && ds(order(j)) > dv) { order(j + 1) = order(j); j -= 1 }
      order(j + 1) = o
      s += 1
    }
    var bestKey = Double.MaxValue
    var bestCell = -1
    var oi = 0
    while (oi < m) {
      val su = order(oi)
      val lb = ds(su) - idx.radii(su)
      val bound = xx + bestKey // best true squared distance so far
      if (bestCell < 0 || lb <= 0.0 ||
        lb * lb <= math.max(0.0, bound) * (1.0 + 1e-9) + 1e-12) {
        val ch = idx.children(su)
        var ci = 0
        while (ci < ch.length) {
          val c = ch(ci)
          val ct = cents(c)
          val d = math.min(n, ct.length)
          var dot = 0.0; i = 0
          while (i < d) { dot += get(v, i, float) * ct(i); i += 1 }
          val key = norms(c) - 2.0 * dot
          if (key < bestKey || (key == bestKey && c < bestCell)) {
            bestKey = key; bestCell = c
          }
          ci += 1
        }
      }
      oi += 1
    }
    bestCell
  }
}

/** cell_assign_coarse(vec, cents, m): the exact nearest-centroid index
  * via the two-level pruned search — scalar INT drop-in for
  * `array_position(cell_dists(..)..)` at large k.
  */
case class CellAssignCoarse(vec: Expression, cents: Expression,
    m: Expression) extends TernaryExpression {
  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = m

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PqKernels.vecOk(vec)) TypeCheckResult.TypeCheckFailure(
      s"cell_assign_coarse requires array<float|double> vector, got " +
        vec.dataType.catalogString)
    else if (!cents.foldable || (cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => false
      case _ => true
    })) TypeCheckResult.TypeCheckFailure(
      "cell_assign_coarse requires a foldable array<array<double>> matrix")
    else if (!m.foldable || m.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "cell_assign_coarse requires a foldable INT super-cell count")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType

  @transient private lazy val centMat: Array[Array[Double]] = {
    val arr = cents.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
  }
  @transient private lazy val norms: Array[Double] = centMat.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }
  @transient private lazy val index: CoarseKernels.CoarseIndex =
    CoarseKernels.buildIndex(centMat,
      m.eval().asInstanceOf[Int])
  @transient private lazy val fl = PqKernels.isFloat(vec)

  override def nullSafeEval(v: Any, c: Any, mm: Any): Any =
    CoarseKernels.assignCoarse(v.asInstanceOf[ArrayData], centMat, norms,
      index, fl)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarseCents", centMat, "double[][]")
    val nRef = ctx.addReferenceObj("coarseNorms", norms, "double[]")
    val iRef = ctx.addReferenceObj("coarseIdx", index,
      "graft.functions.CoarseKernels.CoarseIndex")
    val flS = if (fl) "true" else "false"
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = graft.functions.CoarseKernels.assignCoarse(" +
        s"$v, $cRef, $nRef, $iRef, $flS);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): CellAssignCoarse =
    copy(vec = f, cents = s, m = t)
  override def prettyName: String = "cell_assign_coarse"
}
