package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew.
  *
  * AQE's skew-join splitting (on by default in Engine.configure) handles
  * most skew at runtime by splitting oversized shuffle partitions. This
  * helper is the static fallback for the worst case AQE cannot fix: a
  * single join *key* so hot that one task would still own it entirely
  * (e.g. the null-ish or default-value key of a 100 TB fact table).
  *
  * Left (large, skewed) rows get a random salt in [0, salts); right
  * (smaller) rows are replicated once per salt value. The join key becomes
  * (key, salt), spreading each hot key over `salts` tasks. Row multiplicity
  * is unchanged, so any downstream aggregate is unaffected.
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltedLeft = left
      .withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLeft
      .join(saltedRight,
        leftKey === rightKey && saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop("__salt")
  }
}
