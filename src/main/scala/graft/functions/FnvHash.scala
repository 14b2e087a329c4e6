package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a over the value's bytes.
  *
  * Re-expresses the reference's `fnv_hash` builtin
  * (`be/src/exprs/utility-functions.h`, hash core in
  * `be/src/util/hash-util.h` `FnvHash64`) as a native Catalyst expression
  * so it stays inside whole-stage codegen — per SURVEY.md section 2.5 the
  * preference order is native `Expression` > Scala UDF.
  *
  * Accepts STRING or BINARY input; NULL in -> NULL out.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fnv_hash requires STRING or BINARY input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => FnvHash64.hash64(s.getBytes)
    case b: Array[Byte] => FnvHash64.hash64(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FnvHash64.hash64(${bytes(c)});")
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
}
