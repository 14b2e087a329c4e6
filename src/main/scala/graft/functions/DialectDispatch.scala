package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, Round, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Post-analysis type dispatch for dialect builtins whose rewrite depends
  * on the argument's resolved type. A temp-function builder runs at parse
  * time, when column arguments may still be unresolved — deciding the
  * rewrite there makes semantics depend on analyzer resolution order.
  * These wrappers defer the decision into `replacement`, which the
  * analyzer only evaluates once the child is resolved, so the same SQL
  * always takes the same path.
  */

/** fnv_hash(x): native-byte hashing for fixed-width/string/binary types,
  * string-render fallback for the rest (decimal/timestamp — documented
  * divergence, see ImpalaFunctions).
  */
case class FnvHashDialect(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case StringType | BinaryType | BooleanType | ByteType | ShortType |
         IntegerType | LongType | FloatType | DoubleType => FnvHash64(child)
    case _ => FnvHash64(Cast(child, StringType))
  }

  override protected def withNewChildInternal(c: Expression): FnvHashDialect =
    copy(child = c)
  override def prettyName: String = "fnv_hash"
}

/** round(x): Impala's 1-arg round returns BIGINT for double/float input
  * (`be/src/exprs/math-functions.h` Round), Spark's keeps DOUBLE. For
  * already-integral or decimal inputs Spark's semantics are kept.
  */
case class DialectRound(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType => Cast(Round(child, Literal(0)), LongType)
    case _ => Round(child, Literal(0))
  }

  override protected def withNewChildInternal(c: Expression): DialectRound =
    copy(child = c)
  override def prettyName: String = "round"
}
