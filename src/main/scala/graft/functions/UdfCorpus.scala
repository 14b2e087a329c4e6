package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** The reference's UDF/UDA conformance corpus surface
  * (`QueryTest/udf.test`, `QueryTest/uda.test`): the functions those
  * files call, installed the way a user would install them here.
  *
  * The reference creates them from a shared library
  * (`be/src/udf_samples/udf-sample.cc`, `uda-sample.cc`,
  * `testdata/udfs/impala-hive-udfs.jar` via `CREATE FUNCTION ...
  * SYMBOL=...`). The Spark analogs, by calling convention:
  *
  *  - fixed-arity scalar UDFs (`no_args`, `four_args`..`eight_args`,
  *    `all_types_fn`, `validate_arg_type`) register through the public
  *    `spark.udf.register` surface — the §2.6 user path;
  *  - overload-set / variadic / planner-aware functions (`identity` over
  *    every type, `var_sum`, `var_and`, `var_sum_multiply`,
  *    `constant_arg`) can't be Scala UDFs (one signature per name), so
  *    they register as expression builders — the same registry the
  *    dialect functions use, and the Spark twin of the reference's
  *    per-signature function-overload resolution
  *    (`fe/.../catalog/Function.java` overload matching);
  *  - UDAs (`hll`, `test_count`, `sum_small_decimal`, `trunc_sum`)
  *    compose Catalyst aggregates (hll reuses the engine's
  *    reference-formula NdvHll sketch).
  */
object UdfCorpus {

  def register(spark: SparkSession): Unit = {
    // ---- spark.udf.register surface ------------------------------------
    spark.udf.register("no_args", udf(() => "string"))
    spark.udf.register("validate_arg_type", udf((_: String) => true))
    spark.udf.register("four_args",
      udf((a: Int, b: Int, c: Int, d: Int) => a + b + c + d))
    spark.udf.register("five_args",
      udf((a: Int, b: Int, c: Int, d: Int, e: Int) => a + b + c + d + e))
    spark.udf.register("six_args",
      udf((a: Int, b: Int, c: Int, d: Int, e: Int, f: Int) =>
        a + b + c + d + e + f))
    spark.udf.register("seven_args",
      udf((a: Int, b: Int, c: Int, d: Int, e: Int, f: Int, g: Int) =>
        a + b + c + d + e + f + g))
    spark.udf.register("eight_args",
      udf((a: Int, b: Int, c: Int, d: Int, e: Int, f: Int, g: Int, h: Int) =>
        a + b + c + d + e + f + g + h))
    // AllTypesFn (udf-sample.cc): len(string) + bool + every numeric,
    // floating-point args truncated to integers
    spark.udf.register("all_types_fn",
      udf((s: String, b: Boolean, t: Byte, sm: Short, i: Int, l: Long,
          f: Float, d: Double, dec: java.math.BigDecimal) =>
        (s.length + (if (b) 1 else 0) + t + sm + i + l + f.toLong +
          d.toLong + dec.longValue()).toInt))

    // ---- expression-builder surface ------------------------------------
    val reg = spark.sessionState.functionRegistry
    def temp(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    // Identity for EVERY type (udf-sample.cc Identity overload set):
    // type-preserving pass-through
    temp("identity") { case Seq(e) => e }

    // ConstantArg (udf-sample.cc): the value when the planner can hand
    // the UDF a constant, NULL when the argument is non-constant
    temp("constant_arg") { case Seq(e) =>
      if (e.foldable) e else Literal.create(null, e.dataType)
    }

    // VarAnd / VarSum / VarSumMultiply (udf-sample.cc varargs UDFs)
    temp("var_and") { args =>
      args.map(Cast(_, BooleanType): Expression).reduce(And(_, _))
    }
    temp("var_sum") { args =>
      if (args.forall(_.dataType == StringType))
        // string overload sums lengths
        args.map(Length(_): Expression).reduce(Add(_, _))
      else if (args.exists(_.dataType.isInstanceOf[DecimalType]))
        // the sample lib's decimal signature is decimal(4,2); Impala
        // coerces every argument to it before the call
        args.map(Cast(_, DecimalType(4, 2)): Expression).reduce(Add(_, _))
      else
        args.map(Cast(_, IntegerType): Expression).reduce(Add(_, _))
    }
    temp("var_sum_multiply") { case first +: rest =>
      // first * sum(rest), NULL ints skipped (VarSumMultiply loops
      // only over non-null args), NULL first arg propagates
      val sum = rest
        .map(e => Coalesce(Seq(Cast(e, DoubleType), Literal(0.0))): Expression)
        .reduce(Add(_, _))
      Multiply(Cast(first, DoubleType), sum)
    }

    // ---- UDAs (uda-sample.cc / test-udas.cc) ---------------------------
    // hll: the sample UDA prints its distinct estimate as a STRING; the
    // engine's NdvHll is the same reference HLL formula
    temp("hll") { case Seq(e) =>
      Cast(NdvHll(e).toAggregateExpression(), StringType)
    }
    // CountUpdate: non-null count
    temp("test_count") { case Seq(e) =>
      Count(Seq(e)).toAggregateExpression()
    }
    // SumSmallDecimalUpdate: fixed decimal(9,2) signature
    temp("sum_small_decimal") { case Seq(e) =>
      Cast(Sum(Cast(e, DecimalType(9, 2))).toAggregateExpression(),
        DecimalType(9, 2))
    }
    // TruncSumUpdate: doubles summed, finalize truncates to bigint
    temp("trunc_sum") { case Seq(e) =>
      Cast(Sum(Cast(e, DoubleType)).toAggregateExpression(), LongType)
    }
  }
}
