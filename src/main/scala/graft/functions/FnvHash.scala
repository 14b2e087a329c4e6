package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a over the value's bytes.
  *
  * Re-expresses the reference's `fnv_hash` builtin
  * (`be/src/exprs/utility-functions.h`, hash core in
  * `be/src/util/hash-util.h` `FnvHash64`) as a native Catalyst expression
  * so it stays inside whole-stage codegen — per SURVEY.md section 2.5 the
  * preference order is native `Expression` > Scala UDF.
  *
  * STRING/BINARY hash their raw bytes; numeric/boolean inputs hash their
  * fixed-width little-endian native representation — matching the
  * reference, which hashes the value's raw slot bytes
  * (`utility-functions.cc FnvHash` passes sizeof(type)), NOT a string
  * rendering. NULL in -> NULL out.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | BooleanType | ByteType | ShortType |
         IntegerType | LongType | FloatType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fnv_hash requires STRING, BINARY, BOOLEAN or a fixed-width numeric " +
        s"input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => FnvHash64.hash64(s.getBytes)
    case b: Array[Byte] => FnvHash64.hash64(b)
    case b: java.lang.Boolean =>
      FnvHash64.hashFixed(if (b.booleanValue()) 1L else 0L, 1)
    case b: java.lang.Byte => FnvHash64.hashFixed(b.longValue(), 1)
    case s: java.lang.Short => FnvHash64.hashFixed(s.longValue(), 2)
    case i: java.lang.Integer => FnvHash64.hashFixed(i.longValue(), 4)
    case l: java.lang.Long => FnvHash64.hashFixed(l.longValue(), 8)
    case f: java.lang.Float =>
      FnvHash64.hashFixed(java.lang.Float.floatToIntBits(f.floatValue()).toLong, 4)
    case d: java.lang.Double =>
      FnvHash64.hashFixed(java.lang.Double.doubleToLongBits(d.doubleValue()), 8)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call: String => String = child.dataType match {
      case StringType => c => s"graft.functions.FnvHash64.hash64($c.getBytes())"
      case BinaryType => c => s"graft.functions.FnvHash64.hash64($c)"
      case BooleanType =>
        c => s"graft.functions.FnvHash64.hashFixed($c ? 1L : 0L, 1)"
      case ByteType => c => s"graft.functions.FnvHash64.hashFixed((long) $c, 1)"
      case ShortType => c => s"graft.functions.FnvHash64.hashFixed((long) $c, 2)"
      case IntegerType => c => s"graft.functions.FnvHash64.hashFixed((long) $c, 4)"
      case LongType => c => s"graft.functions.FnvHash64.hashFixed($c, 8)"
      case FloatType => c =>
        s"graft.functions.FnvHash64.hashFixed((long) java.lang.Float.floatToIntBits($c), 4)"
      case DoubleType => c =>
        s"graft.functions.FnvHash64.hashFixed(java.lang.Double.doubleToLongBits($c), 8)"
    }
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${call(c)};")
  }

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)

  override def prettyName: String = "fnv_hash"
}

object FnvHash64 {
  final val Prime: Long = 1099511628211L
  final val Seed: Long = -3750763034362895579L // 14695981039346656037 as signed

  /** FNV-1a 64: hash = (hash ^ byte) * prime, starting from the offset
    * basis. Matches the reference's HashUtil::FnvHash64.
    */
  def hash64(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  /** FNV-1a over the low `width` little-endian bytes of v — the raw slot
    * bytes of a fixed-width native value, as the reference hashes them.
    */
  def hashFixed(v: Long, width: Int): Long = {
    var h = Seed
    var i = 0
    while (i < width) {
      h = (h ^ ((v >>> (8 * i)) & 0xffL)) * Prime
      i += 1
    }
    h
  }
}
