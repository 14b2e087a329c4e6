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
  * arithmetic is IEEE-deterministic and identical in both engines, and
  * decimal addition is exact, hence association-free.
  *
  * Two refinements from the r8 scale sweep:
  *  - The cast is tie-free only for RAW 2dp columns (stored doubles sit
  *    within ~1e-9 of their decimal value). COMPUTED double products land
  *    arbitrarily close to rounding ties, where the engines' conversion
  *    methods differ — money products must use the exact-decimal factor
  *    chain below (dmoney/drate/oneMinus/onePlus + dsumx) instead.
  *  - DuckDB's wide-DECIMAL->DOUBLE cast double-rounds (hugeint->double
  *    / 10^scale), drifting 1 ulp once sum*10^scale > 2^53; every oSum*
  *    snippet routes the final cast through VARCHAR (single strtod
  *    rounding), matching Spark's correctly-rounded Decimal.toDouble.
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

  // ---- exact-decimal product chain ----------------------------------
  // The r8 scale sweep (10x corpus, ~6M lineitem rows) caught dsum6
  // diverging by ~4e-6 on double PRODUCTS: casting a computed double to
  // decimal rounds the shortest-repr BigDecimal in Spark but the scaled
  // value in DuckDB, and near-tie products appear at roughly 1e-6
  // probability per row. Raw 2dp COLUMNS are tie-free (stored doubles
  // sit within 1e-9 of their 2dp value), so the SF-proof recipe is:
  // cast each factor to decimal FIRST, multiply/sum exactly in decimal,
  // one cast to double at the end. Types stay under precision 38 so no
  // Spark adjustPrecisionScale rounding kicks in.
  val D12_2: DecimalType = DecimalType(12, 2)
  val D4_2: DecimalType = DecimalType(4, 2)

  /** Money/quantity factor (< 10^10, 2dp) as exact decimal. */
  def dmoney(c: Column): Column = c.cast(D12_2)

  /** Rate factor in [0,1] (2dp) as exact decimal. */
  def drate(c: Column): Column = c.cast(D4_2)

  /** (1 - rate) / (1 + rate) as exact decimals. */
  def oneMinus(c: Column): Column = lit(1).cast(DecimalType(3, 2)) - drate(c)
  def onePlus(c: Column): Column = lit(1).cast(DecimalType(3, 2)) + drate(c)

  /** Sum an ALREADY-exact decimal product; single cast to double
    * (Spark's Decimal.toDouble is correctly rounded — probed against
    * the failing r8-sweep value).
    */
  def dsumx(c: Column): Column = sum(c).cast(DoubleType)

  // Matching DuckDB oracle snippets.
  def oMoney(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def oRate(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  def oOneMinus(e: String): String = s"(CAST(1 AS DECIMAL(3,2)) - ${oRate(e)})"
  def oOnePlus(e: String): String = s"(CAST(1 AS DECIMAL(3,2)) + ${oRate(e)})"
  // DuckDB's wide-DECIMAL -> DOUBLE cast is hugeint->double / 10^scale:
  // TWO roundings, so once sum*10^scale exceeds 2^53 it can land 1 ulp
  // off the correctly-rounded value (the r8 sweep's q1 diff). Routing
  // through VARCHAR (exact digits, then one strtod rounding) matches
  // Spark's correctly-rounded Decimal.toDouble at every magnitude.
  def oSumX(e: String): String =
    s"CAST(CAST(SUM($e) AS VARCHAR) AS DOUBLE)"

  def oSum2(e: String): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
  def oSum6(e: String): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)"
  def oSum10(e: String): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
  def oAvg2(e: String): String = s"${oSum2(e)} / COUNT($e)"
  def oAvg6(e: String): String = s"${oSum6(e)} / COUNT($e)"
}
