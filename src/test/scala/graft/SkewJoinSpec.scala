package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the plain join's result under skew") {
    import spark.implicits._
    // 10k rows all sharing one hot key + a long tail
    val left = spark.range(10000).select(
      when(col("id") < 9000, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val right = (0L to 20L).map(k => (k, s"dim_$k")).toDF("rk", "name")
    val salted = SkewJoin.saltedEquiJoin(left, right, col("k"), col("rk"), 8)
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val plain = left.join(right, col("k") === col("rk"))
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain)
    assert(plain.exists(_._3 == 9000L)) // the hot key really was hot
  }
}
