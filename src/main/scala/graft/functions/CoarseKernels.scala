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

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Self-tuning wrapper: the right super count depends on the
    * centroid GEOMETRY — sqrt(k) supers are optimal for uniform
    * centroids, but clumped ones (the SemDeDup regime: near-dup
    * replicas pull k-means into ~clump-count tight cells) need one
    * super per clump or every super's child radius spans clumps and
    * the triangle bound prunes nothing (measured on the 1000x sweep:
    * m=100 scanned 6,259 of 10,000 centroids per row; m=500 scanned
    * 20). Since the centroids themselves sample the data distribution,
    * the build MEASURES pruning cost directly — simulate the exact
    * search with up to 512 centroids as queries — and escalates m by
    * 4x while that pays, all deterministic driver-side arithmetic.
    */
  /** Measured per-query scan cost of an index: super distances (m)
    * plus children actually visited under the exact pruning rule, for
    * the given query set.
    */
  def simCost(idx: CoarseIndex, cents: Array[Array[Double]],
      queries: Array[Array[Double]]): Double = {
    val m = idx.supers.length
    val tot = new java.util.concurrent.atomic.AtomicLong(0L)
    java.util.Arrays.stream(
      queries.asInstanceOf[Array[AnyRef]]).parallel().forEach { vv =>
      val v = vv.asInstanceOf[Array[Double]]
      var xx = 0.0; var i = 0
      while (i < v.length) { xx += v(i) * v(i); i += 1 }
      val ds = new Array[Double](m)
      var s = 0
      while (s < m) {
        ds(s) = math.sqrt(math.max(0.0, d2(v, idx.supers(s))))
        s += 1
      }
      val order = ds.zipWithIndex.sortBy(_._1).map(_._2)
      var bestKey = Double.MaxValue
      order.foreach { su =>
        val lb = ds(su) - idx.radii(su)
        val bound = xx + bestKey
        if (bestKey == Double.MaxValue || lb <= 0.0 ||
          lb * lb <= math.max(0.0, bound) * (1.0 + 1e-9) + 1e-12) {
          tot.addAndGet(idx.children(su).length.toLong)
          idx.children(su).foreach { c =>
            var dot = 0.0; var i2 = 0
            while (i2 < v.length) { dot += v(i2) * cents(c)(i2); i2 += 1 }
            var nn = 0.0; i2 = 0
            val ct = cents(c)
            while (i2 < ct.length) { nn += ct(i2) * ct(i2); i2 += 1 }
            val key = nn - 2.0 * dot
            if (key < bestKey) bestKey = key
          }
        }
      }
    }
    m.toDouble + tot.get().toDouble / math.max(1, queries.length)
  }

  /** Choose the super count by MEASURING pruning against a sample of
    * REAL input rows (the centroids alone are a misleading proxy: a
    * centroid query finds a zero-distance twin and prunes everything;
    * duplicate-heavy centroid sets make even leave-one-out
    * optimistic — measured 222 ops/query simulated vs ~6,250 real at
    * m=100 on the 1000x sweep, where real rows sit 0.48 from their
    * nearest centroid). Escalates m by 4x while the measured cost
    * stays above 4x the super-scan floor and keeps improving; falls
    * back to leave-nothing-out centroid queries when no sample is
    * supplied. Everything is deterministic driver-side arithmetic —
    * the CHOICE only affects speed, never the assignment (exact for
    * any index).
    */
  def chooseM(cents: Array[Array[Double]], m0: Int,
      sample: Array[Array[Double]]): Int = {
    val k = cents.length
    val queries = if (sample.nonEmpty) sample
      else if (k <= 512) cents
      else Array.tabulate(512)(i => cents(((i.toLong * k) / 512).toInt))
    var best = buildIndex(cents, m0)
    var bestCost = simCost(best, cents, queries)
    var bestM = m0
    var m = m0 * 4
    while (m <= k / 4 && bestCost > 4.0 * best.supers.length) {
      val cand = buildIndex(cents, m)
      val cc = simCost(cand, cents, queries)
      if (cc < bestCost) { best = cand; bestCost = cc; bestM = m }
      m *= 4
    }
    // one driver-side diagnostic line per plan build (stderr)
    System.err.println(
      f"[coarse-index] k=$k chosen m=$bestM simCost=$bestCost%.0f/query queries=${queries.length}")
    bestM
  }

  /** Deterministic super-clustering of the centroids. Quality matters
    * more than for an ANN coarse quantizer because the search is
    * EXACT: one giant super with a large child radius is visited by
    * every query and scans all its children (the first strided-init
    * mini-Lloyd build left a max-1080-children, radius-1.0 super on
    * the 1000x sweep — 78% of all centroids scanned per row). Recipe:
    * farthest-point (maximin) init — spreads supers across centroid
    * clumps deterministically — 5 Lloyd iterations, then SPLIT any
    * super holding more than 4x the average until bounded (each split
    * seeds 2-means with the two mutually-farthest children), so both
    * the child count and the radius of every super stay small.
    */
  private def parRange(n: Int)(f: Int => Unit): Unit =
    java.util.stream.IntStream.range(0, n).parallel().forEach(i => f(i))

  def buildIndex(cents: Array[Array[Double]], m0: Int): CoarseIndex = {
    val k = cents.length
    val m = math.max(1, math.min(m0, k))
    val dim = cents(0).length
    // maximin init: O(k*m*dim) total, the O(k*dim) inner passes
    // parallelized (the build runs on the driver; at escalated m this
    // was a measured multi-minute single-thread stall)
    val chosen = new Array[Int](m)
    val minD = Array.fill(k)(Double.MaxValue)
    chosen(0) = 0
    parRange(k)(c => minD(c) = d2(cents(c), cents(0)))
    var ci = 1
    while (ci < m) {
      var far = 0; var farD = -1.0
      var c = 0
      while (c < k) {
        if (minD(c) > farD) { farD = minD(c); far = c }
        c += 1
      }
      chosen(ci) = far
      parRange(k) { c =>
        val d = d2(cents(c), cents(far))
        if (d < minD(c)) minD(c) = d
      }
      ci += 1
    }
    var supers = chosen.map(cents(_).clone()).toBuffer
    val assign = new Array[Int](k)
    def assignAll(): Unit = {
      val sArr = supers.toArray
      parRange(k) { c =>
        var best = Double.MaxValue; var bi = 0; var s = 0
        while (s < sArr.length) {
          val d = d2(cents(c), sArr(s))
          if (d < best) { best = d; bi = s }
          s += 1
        }
        assign(c) = bi
      }
    }
    def lloydStep(): Unit = {
      val sums = Array.fill(supers.length, dim)(0.0)
      val cnt = new Array[Long](supers.length)
      var c = 0
      while (c < k) {
        val s = assign(c); cnt(s) += 1; var i = 0
        while (i < dim) { sums(s)(i) += cents(c)(i); i += 1 }
        c += 1
      }
      var s = 0
      while (s < supers.length) {
        if (cnt(s) > 0)
          supers(s) = Array.tabulate(dim)(i => sums(s)(i) / cnt(s))
        s += 1
      }
    }
    var it = 0
    while (it < 3) { assignAll(); lloydStep(); it += 1 }
    assignAll()
    // split oversized supers until every child list is bounded
    val cap = math.max(8, (4L * k / m).toInt)
    var grew = true
    while (grew && supers.length < 4 * m) {
      grew = false
      val byS = (0 until k).groupBy(assign)
      byS.find(_._2.length > cap).foreach { case (s, kids) =>
        // seed 2-means with the two mutually-farthest children
        // (approximated: farthest from the mean, then farthest from it)
        val a = kids.maxBy(c => d2(cents(c), supers(s)))
        val b = kids.maxBy(c => d2(cents(c), cents(a)))
        var ca = cents(a).clone(); var cb = cents(b).clone()
        var r = 0
        while (r < 3) {
          val (ka, kb) = kids.partition(c => d2(cents(c), ca) <= d2(cents(c), cb))
          def mean(xs: Seq[Int], fb: Array[Double]) =
            if (xs.isEmpty) fb
            else Array.tabulate(dim)(i => xs.map(cents(_)(i)).sum / xs.length)
          ca = mean(ka, ca); cb = mean(kb, cb)
          r += 1
        }
        val newIdx = supers.length
        supers(s) = ca
        supers += cb
        kids.foreach { c =>
          assign(c) = if (d2(cents(c), ca) <= d2(cents(c), cb)) s else newIdx
        }
        grew = true
      }
    }
    val mm = supers.length
    val children = Array.tabulate(mm)(s =>
      (0 until k).filter(assign(_) == s).toArray)
    val radii = Array.tabulate(mm) { s =>
      var r = 0.0
      children(s).foreach(c => r = math.max(r, math.sqrt(d2(cents(c), supers(s)))))
      r
    }
    val superArr = supers.toArray
    val superNorms = superArr.map(s => { var a = 0.0; var i = 0
      while (i < s.length) { a += s(i) * s(i); i += 1 }; a })
    CoarseIndex(superArr, superNorms, children, radii)
  }

  private def get(v: ArrayData, i: Int, float: Boolean): Double =
    if (float) v.getFloat(i).toDouble else v.getDouble(i)

  /** Exact argmin cell. Comparison key per candidate is EXACTLY
    * [[PqKernels.cellDists]]'s norms(c) - 2 x.c (same loop), so the
    * result matches the flat scan bit-for-bit, first-index ties
    * included.
    */
  // per-thread scratch: the kernel runs once per row inside codegen —
  // per-row array allocation at m ~ hundreds is pure GC churn. The
  // first slot holds the row vector COPIED OUT of ArrayData: the
  // per-element getFloat/getDouble accessor (virtual call + float
  // branch) costs ~20 ns/element and was the measured wall of the
  // whole assignment scan (38 s where the flop count says < 1 s);
  // extracting once per row makes every inner loop pure double[] math.
  private val scratch =
    new ThreadLocal[(Array[Double], Array[Long], Array[Double])] {
      override def initialValue(): (Array[Double], Array[Long], Array[Double]) =
        (new Array[Double](0), new Array[Long](0), new Array[Double](0))
    }

  def assignCoarse(v: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], idx: CoarseIndex, float: Boolean): Int = {
    val n = v.numElements()
    val m = idx.supers.length
    var sc = scratch.get()
    if (sc._1.length < m || sc._3.length < n) {
      sc = (new Array[Double](math.max(m, sc._1.length)),
        new Array[Long](math.max(m, sc._2.length)),
        new Array[Double](math.max(n, sc._3.length)))
      scratch.set(sc)
    }
    val q = sc._3
    var i = 0
    while (i < n) { q(i) = get(v, i, float); i += 1 }
    var xx = 0.0
    i = 0
    while (i < n) { val x = q(i); xx += x * x; i += 1 }
    val ds = sc._1
    val order = sc._2
    var s = 0
    while (s < m) {
      val sp = idx.supers(s)
      val d = math.min(n, sp.length)
      var dot = 0.0; i = 0
      while (i < d) { dot += q(i) * sp(i); i += 1 }
      ds(s) = math.sqrt(math.max(0.0, xx + idx.superNorms(s) - 2.0 * dot))
      // non-negative double bits are order-preserving as signed longs;
      // pack the super index into the low 21 bits (visit ORDER is a
      // performance heuristic — the result is order-independent, so
      // the tiny key truncation is harmless) and sort PRIMITIVES:
      // the previous per-row insertion sort was O(m^2) and dominated
      // the 1000x sweep once the adaptive index escalated m
      order(s) = (java.lang.Double.doubleToRawLongBits(ds(s))
        & 0xffffffffffe00000L) | s
      s += 1
    }
    java.util.Arrays.sort(order, 0, m)
    var bestKey = Double.MaxValue
    var bestCell = -1
    var oi = 0
    while (oi < m) {
      val su = (order(oi) & 0x1fffffL).toInt
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
          while (i < d) { dot += q(i) * ct(i); i += 1 }
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
