package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, Average, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `avg(timestamp)` — the reference supports averaging timestamps
  * (`be/src/exprs/aggregate-functions.cc` TimestampAvgUpdate/GetValue),
  * Spark's `Average` does not. The reference's arithmetic, reproduced
  * bit-for-bit here so rendered values line up with its conformance
  * corpus at shared precision:
  *
  *  - each input converts to a single DOUBLE of epoch seconds:
  *    whole-second time_t + fractional nanos * 1e-9
  *    (`timestamp-value.h` ToSubsecondUnixTime). Embedding a sub-second
  *    fraction into a ~1.2e9-magnitude double quantizes it to the
  *    2^-22-second grid — the reference's well-known `.199999809`-style
  *    outputs, kept rather than "fixed" because its expected values
  *    depend on them;
  *  - sum/count accumulate in double exactly like AvgState;
  *  - the result reconstructs via whole = trunc(avg),
  *    nanos = trunc((avg - whole) / 1e-9) (`TimestampValue(double)`),
  *    truncated to Spark's microsecond resolution (documented engine
  *    precision bound, same as nanoseconds_add/_sub).
  *
  * Declarative (codegen'd) aggregate: works in GROUP BY, partitioned
  * windows, and running/sliding frames alike.
  */
case class TimestampAvg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  private lazy val sum = AttributeReference("sum", DoubleType, nullable = false)()
  private lazy val count = AttributeReference("count", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    sum :: count :: Nil

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0L))

  // epoch micros of the input; TimestampType and NTZ are both physical
  // micros (UTC session, so the NTZ cast is micros-identity)
  private lazy val micros: Expression = child.dataType match {
    case TimestampType => UnixMicros(child)
    case _ => UnixMicros(Cast(child, TimestampType))
  }

  // ToSubsecondUnixTime: double(whole time_t seconds) + nanos * 1e-9
  private lazy val asDouble: Expression = {
    val fracMicros = Pmod(micros, Literal(1000000L))
    val whole = IntegralDivide(Subtract(micros, fracMicros), Literal(1000000L))
    Add(
      Cast(whole, DoubleType),
      Multiply(Cast(Multiply(fracMicros, Literal(1000L)), DoubleType),
        Literal(1e-9)))
  }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), sum, Add(sum, asDouble)),
    If(IsNull(child), count, Add(count, Literal(1L))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sum.left, sum.right),
    Add(count.left, count.right))

  override lazy val evaluateExpression: Expression = {
    val avgd = Divide(sum, Cast(count, DoubleType))
    // TimestampValue(double): time_t whole = d (C trunc-toward-zero);
    // nanos = (d - whole) / 1e-9, truncated by the integral conversion
    val whole = Cast(avgd, LongType)
    val nanos = Cast(
      Divide(Subtract(avgd, Cast(whole, DoubleType)), Literal(1e-9)),
      LongType)
    val outMicros = Add(
      Multiply(whole, Literal(1000000L)),
      IntegralDivide(nanos, Literal(1000L)))
    If(EqualTo(count, Literal(0L)),
      Literal(null, TimestampType),
      MicrosToTimestamp(outMicros))
  }

  override protected def withNewChildInternal(c: Expression): TimestampAvg =
    copy(child = c)
  override def prettyName: String = "avg"
}

/** Session `avg` override: timestamp children take [[TimestampAvg]],
  * everything else defers to Spark's own [[Average]] untouched. The
  * dispatch is a post-analysis RuntimeReplaceableAggregate so the choice
  * happens once the child's type is resolved (same rationale as
  * [[FnvHashDialect]]).
  */
case class DialectAvg(child: Expression)
    extends AggregateFunction with RuntimeReplaceableAggregate
    with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case TimestampType | TimestampNTZType => TimestampAvg(child)
    case _ => Average(child)
  }

  override protected def withNewChildInternal(c: Expression): DialectAvg =
    copy(child = c)
  override def prettyName: String = "avg"
}
