package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The MADlib vector interop builtins
  * (`be/src/exprs/udf-builtins.cc:466-560`, registry
  * `impala_functions.py` madlib_*): a "vector" is the packed
  * little-endian 8-byte doubles the MADlib library exchanges, plus a
  * printable ascii encoding (each double narrowed to float, its 4
  * bytes spread over 8 chars 'a'+nibble, low nibble first) used to
  * round-trip vectors through text-only channels.
  *
  * Conformance pins (`expr-test.cc:5542-5559`, DialectSurfaceSpec "madlib vector family"):
  * `madlib_encode_vector(madlib_vector(1.0, 2.0, 3.0))` =
  * "aaaaaipdaaaaaaaeaaaaaeae"; get(0..2) = 1.0/2.0/3.0; out-of-range
  * index is NULL; print is "<1, 2, 3>" (C++ default ostream double
  * formatting: 6 significant digits, trailing zeros stripped).
  *
  * Eval-only expressions (CodegenFallback): interop utilities, never on
  * a hot path. Vectors carry as BINARY (the reference's STRING is raw
  * bytes; Spark strings must be valid UTF-8, binary is the honest
  * type); the ascii encoding is a STRING.
  */
object MadlibVector {

  /** The reference types vectors as STRING (raw bytes); Spark callers
    * may hand either a BINARY or a STRING value — accept both.
    */
  private[functions] def asBytes(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
    case null => null
  }

  private[functions] def validate(bytes: Array[Byte]): Unit = {
    if (bytes == null)
      throw new IllegalArgumentException("MADlib vector is null")
    if (bytes.length % 8 != 0)
      throw new IllegalArgumentException(
        s"MADlib vector of incorrect length ${bytes.length}," +
          " expected multiple of 8")
  }

  private[functions] def readDouble(bytes: Array[Byte], i: Int): Double =
    java.nio.ByteBuffer.wrap(bytes, i * 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble

  /** C++ `ostream << double` default formatting: %g with precision 6 —
    * 6 significant digits, trailing zeros (and a bare trailing dot)
    * stripped, scientific form outside [1e-5, 1e6).
    */
  private[functions] def cppDouble(d: Double): String = {
    // C++ streams print "inf"/"nan"; Java "Infinity"/"NaN"
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0" else "0"
    // glibc %g rounds the EXACT binary value half-to-even; Java's
    // Formatter rounds HALF_UP, which diverges on decimal-tie doubles
    // (e.g. 1234565.0) — go through exact BigDecimal + HALF_EVEN
    val bd = new java.math.BigDecimal(d).round(
      new java.math.MathContext(6, java.math.RoundingMode.HALF_EVEN))
    val exp = bd.precision - bd.scale - 1
    def strip(x: String): String =
      if (x.contains('.'))
        x.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else x
    if (exp < -4 || exp >= 6) {
      val mant = strip(bd.movePointLeft(exp).toPlainString)
      val es = (if (exp < 0) "-" else "+") +
        "%02d".format(math.abs(exp))
      mant + "e" + es
    } else strip(bd.toPlainString)
  }
}

/** madlib_vector(d1, d2, ...) -> packed doubles (BINARY). A NULL entry
  * is the reference's SetError path -> error here too.
  */
case class MadlibVectorPack(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val buf = java.nio.ByteBuffer.allocate(children.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    children.foreach { c =>
      val v = c.eval(input)
      if (v == null)
        throw new IllegalArgumentException(s"madlib vector entry $i is NULL")
      buf.putDouble(v.asInstanceOf[Number].doubleValue())
      i += 1
    }
    buf.array()
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MadlibVectorPack = copy(children = cs)
  override def prettyName: String = "madlib_vector"
}

/** madlib_vector_get(index, vector) -> DOUBLE; NULL for a NULL or
  * out-of-range index, error for a malformed vector.
  */
case class MadlibVectorGet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    // reference order (udf-builtins.cc VectorGet): validate the vector
    // first — a malformed/NULL vector errors even when the index is
    // NULL — then a NULL index returns NULL
    val vec = MadlibVector.asBytes(right.eval(input))
    MadlibVector.validate(vec)
    val idx = left.eval(input)
    if (idx == null) return null
    val i = idx.asInstanceOf[Number].longValue()
    if (i < 0 || i >= vec.length / 8) null
    else MadlibVector.readDouble(vec, i.toInt)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MadlibVectorGet = copy(left = l, right = r)
  override def prettyName: String = "madlib_vector_get"
}

/** madlib_encode_vector(vector) -> printable ascii (STRING): each
  * double narrows to float, whose 4 bytes spread across 8 chars
  * 'a'+nibble, low nibble first (udf-builtins.cc InplaceDoubleEncode).
  *
  * Unlike get/length, the reference's EncodeVector
  * (udf-builtins.cc:551-559) does NOT length-validate: it encodes
  * floor(len/8) doubles and copies any trailing remainder bytes
  * through raw — matched here.
  */
case class MadlibEncodeVector(child: Expression)
    extends UnaryExpression with CodegenFallback with UnaryLike[Expression] {

  override def dataType: DataType = StringType

  protected override def nullSafeEval(v: Any): Any = {
    val vec = MadlibVector.asBytes(v)
    val n = vec.length / 8
    val out = new Array[Byte](vec.length)
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToIntBits(
        MadlibVector.readDouble(vec, i).toFloat)
      var k = 0
      while (k < 8) {
        out(i * 8 + k) = ('a' + ((bits >> (4 * k)) & 0xF)).toByte
        k += 1
      }
      i += 1
    }
    System.arraycopy(vec, n * 8, out, n * 8, vec.length - n * 8)
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(c: Expression): MadlibEncodeVector =
    copy(child = c)
  override def prettyName: String = "madlib_encode_vector"
}

/** madlib_decode_vector(ascii) -> vector (BINARY): the inverse of the
  * encoding; precision beyond float is lost, as in the reference.
  *
  * Like encode, the reference's DecodeVector (udf-builtins.cc:561-567)
  * does not length-validate. INTENTIONAL DIVERGENCE on a non-multiple-
  * of-8 tail: InplaceDoubleDecode there writes a full 8-byte double
  * into the partial last group — an out-of-bounds write (C++ UB), not
  * reproducible semantics. We decode full 8-byte groups and copy the
  * remainder bytes through raw.
  */
case class MadlibDecodeVector(child: Expression)
    extends UnaryExpression with CodegenFallback with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType

  protected override def nullSafeEval(v: Any): Any = {
    val in = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    val n = in.length / 8
    val buf = java.nio.ByteBuffer.allocate(in.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      var bits = 0
      var k = 7
      while (k >= 0) {
        bits = (bits << 4) | ((in(i * 8 + k) - 'a') & 0xF)
        k -= 1
      }
      buf.putDouble(java.lang.Float.intBitsToFloat(bits).toDouble)
      i += 1
    }
    buf.put(in, n * 8, in.length - n * 8)
    buf.array()
  }

  override protected def withNewChildInternal(c: Expression): MadlibDecodeVector =
    copy(child = c)
  override def prettyName: String = "madlib_decode_vector"
}

/** madlib_print_vector(vector) -> "<d1, d2, ...>" with C++ default
  * ostream double formatting.
  */
case class MadlibPrintVector(child: Expression)
    extends UnaryExpression with CodegenFallback with UnaryLike[Expression] {

  override def dataType: DataType = StringType

  protected override def nullSafeEval(v: Any): Any = {
    val vec = MadlibVector.asBytes(v)
    MadlibVector.validate(vec)
    val n = vec.length / 8
    val sb = new StringBuilder("<")
    var i = 0
    while (i < n) {
      if (i != 0) sb.append(", ")
      sb.append(MadlibVector.cppDouble(MadlibVector.readDouble(vec, i)))
      i += 1
    }
    sb.append(">")
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): MadlibPrintVector =
    copy(child = c)
  override def prettyName: String = "madlib_print_vector"
}
