package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Conformance with the reference's QueryTest/max-nesting-depth.test:
  * maximally nested struct / array / array-of-struct columns, queried
  * via (a) one absolute path expression resolved in a single scan and
  * (b) the relative-TableRef chain (`from tbl.f t0, t0.item t1, ...`)
  * that plans one subplan per level through plans/NestedTableRefs.
  *
  * The reference's fixture parquet files are generated at its cluster
  * setup (test-warehouse/max_nesting_depth/, not shipped), so this spec
  * writes the same shapes itself: leaf value 42 under N wrapper levels.
  * The reference caps analysis at --max_nesting_depth=100 and these
  * tests run at its cap for struct paths; the relative-ref chain runs
  * at depth 40 — each level is a full Generate in the plan and the
  * engine's analyzer cost grows quadratically with chain length (a
  * planning-time bound, not a data limit; the reference's subplan
  * chain is similarly planning-bound per its own comments).
  */
class NestedDepthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def sql(q: String): DataFrame = Engine.sql(spark, TestSpark.sf, q)
  private val tmp = System.getProperty("java.io.tmpdir")

  test("max-nesting-depth.test: 100-deep struct, absolute path in one scan") {
    // struct<f0: struct<f0: ... int>> with 99 wrappers + leaf
    val lit = (1 to 99).foldLeft("42")((acc, _) => s"named_struct('f0', $acc)")
    val dir = s"$tmp/graft_depth_struct"
    spark.sql(s"select $lit as f").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("struct_tbl")
    val path = "f." + Seq.fill(99)("f0").mkString(".")
    val df = sql(s"select $path from struct_tbl")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(42))
    // the deep path resolves to ONE scan, no joins/generates
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Generate") && !p.contains("Join"), p)
  }

  test("max-nesting-depth.test: deeply nested array, absolute path single scan") {
    val depth = 40
    val lit = (1 to depth).foldLeft("42")((acc, _) => s"array($acc)")
    val dir = s"$tmp/graft_depth_array"
    spark.sql(s"select $lit as f").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("int_array_tbl")
    // absolute ref: FROM int_array_tbl.f.item.item... (unnest every
    // level); star over a collection ref exposes ONLY the leaf item,
    // like the reference
    val path = "int_array_tbl.f." + Seq.fill(depth - 1)("item").mkString(".")
    val df = sql(s"select * from $path")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("item"))
    assert(rows.map(_.getInt(0)).toSeq == Seq(42))
  }

  test("max-nesting-depth.test: relative refs chain one subplan per level") {
    val depth = 40
    spark.read.parquet(s"$tmp/graft_depth_array")
      .createOrReplaceTempView("int_array_tbl")
    val refs = (1 until depth)
      .map(i => s"t${i - 1}.item t$i").mkString(", ")
    val df = sql(s"select * from int_array_tbl.f t0, $refs")
    val rows = df.collect()
    // each level unnests one element; the leaf row carries 42 in the
    // last lateral's output
    assert(rows.length == 1)
    assert(rows(0).getInt(rows(0).length - 1) == 42)
  }

  test("max-nesting-depth.test: array-of-struct alternation resolves both ways") {
    val depth = 30
    // array<struct<f0: array<struct<f0: ...>>>>, leaf int 42
    val lit = (1 to depth).foldLeft("42")(
      (acc, _) => s"array(named_struct('f0', $acc))")
    val dir = s"$tmp/graft_depth_structarray"
    spark.sql(s"select $lit as f").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("struct_array_tbl")
    // relative chain: each level unnests the array and steps into f0
    val refs = (1 until depth).map(i => s"t${i - 1}.f0 t$i").mkString(", ")
    val df = sql(s"select * from struct_array_tbl.f t0, $refs")
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(rows(0).length - 1) == 42)
  }
}
