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
  *
  * Only left-preserving join types are allowed: the right side is
  * replicated `salts` times, so any join that emits UNMATCHED right rows
  * (right_outer, full_outer, right_semi/anti) would emit each of them once
  * per salt. Matched rows are fine in every mode (each left row holds one
  * salt, so each (left, right) pair joins exactly once).
  */
object SkewJoin {

  private val allowedJoinTypes = Set(
    "inner", "cross",
    "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti")

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(allowedJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedEquiJoin supports only left-preserving join types " +
        s"(got '$joinType'): the replicated right side would duplicate " +
        s"unmatched right rows $salts times in right/full outer joins")
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
