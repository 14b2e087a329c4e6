package graft.functions

import graft.{Engine, Q}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-defined function/aggregate surface (SURVEY.md section 2.6).
  *
  * The reference exposes a C++ UDF ABI (`be/src/udf/udf.h:35-60`) and a
  * UDA contract Init/Update/Merge/Serialize/GetValue/Finalize
  * (`udf.h:357-380`). Spark's equivalents are `spark.udf.register` for
  * scalars and `Aggregator[IN, BUF, OUT]` for aggregates — the Aggregator
  * methods map 1:1 (zero=Init, reduce=Update, merge=Merge,
  * finish=GetValue/Finalize, bufferEncoder=Serialize).
  *
  * `WeightedAvg` keeps its running numerator in BigDecimal so the merge
  * order doesn't affect the result (same determinism contract as Det).
  */
object Udx {

  /** Example UDA: weighted average with an exact decimal numerator.
    * IN = (value, weight); BUF = (decimal numerator, long denominator).
    */
  class WeightedAvg extends Aggregator[(Double, Long), (BigDecimal, Long), Double] {
    override def zero: (BigDecimal, Long) = (BigDecimal(0).setScale(6), 0L)
    override def reduce(b: (BigDecimal, Long), a: (Double, Long)): (BigDecimal, Long) =
      (b._1 + BigDecimal(a._1 * a._2).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        b._2 + a._2)
    override def merge(x: (BigDecimal, Long), y: (BigDecimal, Long)): (BigDecimal, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (BigDecimal, Long)): Double =
      if (r._2 == 0) Double.NaN else r._1.toDouble / r._2
    override def bufferEncoder: Encoder[(BigDecimal, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(BigDecimal, Long)]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register the user-surface examples on a session. */
  def register(spark: SparkSession): Unit = {
    // scalar UDF registration path (hive-udf-call / CREATE FUNCTION analog)
    spark.udf.register("title_case",
      (s: String) => if (s == null) null
        else s.split(' ').map(w =>
          if (w.isEmpty) w else s"${w.head.toUpper}${w.tail}").mkString(" "))
    spark.udf.register("weighted_avg", udaf(new WeightedAvg()))
  }

  /** Oracle-checked UDA query: acctbal averaged with deterministic integer
    * weights. The decimal numerator makes Spark's partial/merge tree agree
    * bitwise with DuckDB's sequential sum.
    */
  val weightedAvgQuery: Q = Q("uda_weighted_avg",
    (s, d) => {
      Engine.configure(s)
      register(s)
      Engine.register(s, d)
      s.sql("""SELECT c_nationkey,
        |  weighted_avg(c_acctbal, c_custkey % 7 + 1) AS wavg
        |FROM customer
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    },
    Some("""SELECT c_nationkey,
      |  CAST(SUM(CAST(c_acctbal * (c_custkey % 7 + 1) AS DECIMAL(28,6)))
      |       AS DOUBLE)
      |    / CAST(SUM(c_custkey % 7 + 1) AS BIGINT) AS wavg
      |FROM customer
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  /** Scalar UDF usage, oracle-checked: the UDF's split/capitalize logic
    * re-expressed as DuckDB list ops verifies the registration surface
    * delivers exactly the user's function.
    */
  val titleCaseQuery: Q = Q("udf_title_case",
    (s, d) => {
      Engine.configure(s)
      register(s)
      Engine.register(s, d)
      s.sql("""SELECT p_partkey, title_case(p_name) AS title_name
        |FROM part ORDER BY p_partkey""".stripMargin)
    },
    Some("""SELECT p_partkey,
      |  ARRAY_TO_STRING(LIST_TRANSFORM(STRING_SPLIT(p_name, ' '),
      |    w -> CASE WHEN w = '' THEN w ELSE UPPER(w[1]) || w[2:] END),
      |    ' ') AS title_name
      |FROM part ORDER BY p_partkey""".stripMargin))

  val defs: Seq[Q] = Seq(weightedAvgQuery, titleCaseQuery)
}
