package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One engine capability: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle query for the driver's t2 correctness gate.
  * Column names/types must line up exactly between the two.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Determinism helpers.
  *
  * The t2 gate hash-compares values, so every aggregate over doubles must be
  * bit-identical between Spark (parallel partial aggregation, arbitrary
  * association order) and DuckDB (sequential). Double addition is not
  * associative, so raw SUM(double) is NOT hash-stable.
  *
  * Fix: cast each row's double to a DECIMAL before summing — per-row double
  * arithmetic is IEEE-deterministic and identical in both engines, the
  * double->decimal rounding has no representable ties (a decimal ending in 5
  * at the rounding position has no exact binary representation), and decimal
  * addition is exact, hence association-free. Casting the exact decimal sum
  * back to double is correctly rounded in both engines. The same pattern in
  * the oracle SQL (`oSum*`) yields bit-identical doubles.
  */
object Det {
  val D18_2: DecimalType = DecimalType(18, 2)
  val D28_6: DecimalType = DecimalType(28, 6)
  val D38_10: DecimalType = DecimalType(38, 10)

  /** Exact sum of 2-decimal data (prices, quantities, balances). */
  def dsum2(c: Column): Column = sum(c.cast(D18_2)).cast(DoubleType)

  /** Exact sum of derived per-row doubles (products of 2-decimal data). */
  def dsum6(c: Column): Column = sum(c.cast(D28_6)).cast(DoubleType)

  /** Exact sum for wide/high-precision values (squares, vector products). */
  def dsum10(c: Column): Column = sum(c.cast(D38_10)).cast(DoubleType)

  /** Deterministic average: exact decimal sum over a bigint count. */
  def davg2(c: Column): Column = dsum2(c) / count(c)
  def davg6(c: Column): Column = dsum6(c) / count(c)

  // Matching DuckDB oracle snippets.
  def oSum2(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  def oSum6(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"
  def oSum10(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(38,10))) AS DOUBLE)"
  def oAvg2(e: String): String = s"${oSum2(e)} / COUNT($e)"
  def oAvg6(e: String): String = s"${oSum6(e)} / COUNT($e)"
}
