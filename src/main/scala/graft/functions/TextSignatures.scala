package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Native signature expressions for the dedup pipelines.
  *
  * Spark's higher-order functions (transform/filter/aggregate lambdas) are
  * interpreted — they fall out of whole-stage codegen and box every
  * element. A MinHash signature written with lambdas costs 64 interpreted
  * array passes per row; at 100 TB that is the difference between a
  * CPU-bound scan and a 10x-slower pipeline. These expressions do the same
  * work in one tight JVM loop each (eval + codegen via static helpers),
  * mirroring how the reference pushes per-row work into codegen'd C++
  * (be/src/codegen/llvm-codegen.h:72-108).
  */

/** token_hashes(text): FNV-1a 64 of each whitespace-delimited token of
  * lower(text), duplicates preserved (SimHash weights repeated tokens).
  */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_hashes requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextSignatures.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSignatures.tokenHashes($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
  override def prettyName: String = "token_hashes"
}

/** shingle_hashes(text, n): FNV-1a 64 of each token n-gram of lower(text)
  * (tokens joined by a single space), distinct, order of first occurrence.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("n must be >= 1")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextSignatures.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSignatures.shingleHashes($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** minhash64(hashes): 64-permutation MinHash signature over an
  * ARRAY<BIGINT> of element hashes; permutation i is h -> h*a_i + b_i on
  * the 2^64 ring with fixed seeded coefficients. Empty input -> NULL
  * (callers filter empties before banding).
  */
case class MinHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires ARRAY<BIGINT> input, got ${t.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextSignatures.minhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ev.value
    nullSafeCodeGen(ctx, ev, c =>
      s"""$resultVar = graft.functions.TextSignatures.minhash64($c);
         |if ($resultVar == null) { ${ev.isNull} = true; }""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
  override def prettyName: String = "minhash64"
}

object TextSignatures {
  /** 64 MinHash permutation coefficients from a fixed seed (odd a). */
  val MinhashA: Array[Long] = new Array[Long](64)
  val MinhashB: Array[Long] = new Array[Long](64)
  locally {
    val rnd = new java.util.Random(42)
    var i = 0
    while (i < 64) {
      MinhashA(i) = rnd.nextLong() | 1L
      MinhashB(i) = rnd.nextLong()
      i += 1
    }
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' ||
      b == 0x0b // \v

  /** FNV-1a over bytes [from, to). */
  private def fnvRange(bytes: Array[Byte], from: Int, to: Int, seed: Long): Long = {
    var h = seed
    var i = from
    while (i < to) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvHash64.Prime
      i += 1
    }
    h
  }

  /** Token [start, end) offsets of runs of non-whitespace. */
  private def tokenSpans(bytes: Array[Byte]): mutable.ArrayBuffer[Int] = {
    val spans = new mutable.ArrayBuffer[Int]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(bytes(i))) i += 1
        spans += start
        spans += i
      }
    }
    spans
  }

  def tokenHashes(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val spans = tokenSpans(bytes)
    val out = new Array[Long](spans.length / 2)
    var t = 0
    while (t < out.length) {
      out(t) = fnvRange(bytes, spans(2 * t), spans(2 * t + 1), FnvHash64.Seed)
      t += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val spans = tokenSpans(bytes)
    val nTok = spans.length / 2
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new mutable.LongMap[Boolean]()
    val out = new mutable.ArrayBuffer[Long](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      // hash the n tokens joined by ' ' without materializing the string
      var h = FnvHash64.Seed
      var k = 0
      while (k < n) {
        if (k > 0) h = (h ^ ' '.toLong) * FnvHash64.Prime
        h = fnvRange(bytes, spans(2 * (i + k)), spans(2 * (i + k) + 1), h)
        k += 1
      }
      if (!seen.contains(h)) { seen(h) = true; out += h }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Null for empty input (no shingles -> no signature). */
  def minhash64(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val mins = Array.fill(64)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        val p = h * MinhashA(j) + MinhashB(j)
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
