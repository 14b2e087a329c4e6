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

  test("salted left_outer preserves unmatched left rows exactly once") {
    import spark.implicits._
    val left = spark.range(100).select(
      when(col("id") < 50, lit(7L)).otherwise(col("id") + 1000).as("k"),
      col("id").as("v"))
    val right = Seq((7L, "hot"), (1050L, "tail")).toDF("rk", "name")
    val salted = SkewJoin.saltedEquiJoin(
        left, right, col("k"), col("rk"), 8, "left_outer")
      .select(col("k"), col("v"), col("name"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = left.join(right, col("k") === col("rk"), "left_outer")
      .select(col("k"), col("v"), col("name"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted === plain)
  }

  test("right/full outer joins are rejected (replication would duplicate)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    for (jt <- Seq("right_outer", "full_outer", "outer", "full")) {
      intercept[IllegalArgumentException] {
        SkewJoin.saltedEquiJoin(df, df, col("k"), col("k"), 4, jt)
      }
    }
  }
}
