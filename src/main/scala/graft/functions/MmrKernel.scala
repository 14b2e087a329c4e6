package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** mmr_select(cands, k): Maximal Marginal Relevance re-ranking
  * (Carbonell & Goldstein 1998) of one query's candidate list —
  * greedily select k of the candidates maximizing
  * `0.5 * rel - 0.5 * maxSim(selected)`, ties to the smaller vec_id.
  * `cands` is ARRAY<STRUCT<vec_id BIGINT, rel DOUBLE,
  * embedding ARRAY<FLOAT>>> (rel = precomputed query dot); similarity
  * between candidates is the same sequential-fold double dot product
  * as DotVec, so every score is bit-identical to the DuckDB oracle's
  * LIST_REDUCE mirror (NOTES determinism rule 4) and the selected ID
  * SEQUENCE is hash-checkable even though scores are floats. One
  * kernel call per query — the greedy loop never leaves the executor.
  */
case class MmrSelect(cands: Expression, k: Int) extends UnaryExpression {
  override def child: Expression = cands
  override def checkInputDataTypes(): TypeCheckResult = cands.dataType match {
    case ArrayType(s: StructType, _)
        if k >= 1 && s.length == 3 && s(0).dataType == LongType &&
          s(1).dataType == DoubleType &&
          s(2).dataType.isInstanceOf[ArrayType] =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "mmr_select requires ARRAY<STRUCT<BIGINT, DOUBLE, ARRAY<FLOAT>>> " +
        s"and k >= 1, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MmrKernel.select(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MmrKernel.select($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(cands = newChild)
  override def prettyName: String = "mmr_select"
}

object MmrKernel {
  private def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def select(cands: ArrayData, k: Int): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val emb = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      emb(i) = row.getArray(2)
      i += 1
    }
    val taken = new Array[Boolean](n)
    val maxSim = new Array[Double](n) // 0.0 before any selection
    val out = new Array[Long](math.min(k, n))
    var step = 0
    while (step < out.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val score = 0.5 * rel(j) - 0.5 * maxSim(j)
          if (score > bestScore ||
            (score == bestScore && (best < 0 || ids(j) < ids(best)))) {
            best = j
            bestScore = score
          }
        }
        j += 1
      }
      taken(best) = true
      out(step) = ids(best)
      var m = 0
      while (m < n) {
        if (!taken(m)) {
          val d = dot(emb(m), emb(best))
          if (d > maxSim(m)) maxSim(m) = d
        }
        m += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }
}
