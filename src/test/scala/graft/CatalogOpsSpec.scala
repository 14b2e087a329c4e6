package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for plans/CatalogOps beyond the golden lifecycle files:
  * the LOAD DATA name-conflict rename, overwrite-delete, and
  * missing-source error paths (Frontend.java:528-577 semantics).
  */
class CatalogOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql(q: String) = Engine.sql(spark, TestSpark.sf, q)

  private def mkStaging(name: String, rows: Int): java.io.File = {
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_load_$name")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    spark.range(rows).selectExpr("cast(id as int) x")
      .coalesce(1).write.mode("overwrite").parquet(dir.getPath)
    // give the part file a FIXED name so a second load collides
    val part = dir.listFiles().find(_.getName.startsWith("part-")).get
    val fixed = new java.io.File(dir, "data.parquet")
    assert(part.renameTo(fixed))
    dir.listFiles().filter(f => f.getName.startsWith("_") ||
      f.getName.startsWith(".")).foreach(_.delete())
    dir
  }

  test("load data renames on name conflict instead of clobbering") {
    sql("drop table if exists load_conflict_t")
    sql("create table load_conflict_t (x int) using parquet")
    val s1 = mkStaging("c1", 3)
    sql(s"load data inpath '${s1.getPath}' into table load_conflict_t")
    // same file NAME again, no overwrite: must add alongside, renamed
    val s2 = mkStaging("c2", 4)
    val msg = sql(s"load data inpath '${s2.getPath}' into table load_conflict_t")
      .collect()(0).getString(0)
    assert(msg == "Loaded 1 file(s). Total files in destination location: 2")
    assert(sql("select count(*) from load_conflict_t")
      .collect()(0).getLong(0) == 7)
    sql("drop table load_conflict_t")
  }

  test("load data overwrite replaces the destination's visible files") {
    sql("drop table if exists load_ow_t")
    sql("create table load_ow_t (x int) using parquet")
    val s1 = mkStaging("o1", 3)
    sql(s"load data inpath '${s1.getPath}' into table load_ow_t")
    val s2 = mkStaging("o2", 5)
    val msg = sql(
      s"load data inpath '${s2.getPath}' overwrite into table load_ow_t")
      .collect()(0).getString(0)
    assert(msg == "Loaded 1 file(s). Total files in destination location: 1")
    assert(sql("select count(*) from load_ow_t").collect()(0).getLong(0) == 5)
    sql("drop table load_ow_t")
  }

  test("load data moves (not copies): the staging dir empties") {
    sql("drop table if exists load_mv_t")
    sql("create table load_mv_t (x int) using parquet")
    val s = mkStaging("mv", 2)
    sql(s"load data inpath '${s.getPath}' into table load_mv_t")
    val left = Option(s.listFiles()).map(_.count(f =>
      !f.getName.startsWith("_") && !f.getName.startsWith("."))).getOrElse(0)
    assert(left == 0)
    sql("drop table load_mv_t")
  }

  test("load data from a missing path is the analysis error") {
    sql("drop table if exists load_err_t")
    sql("create table load_err_t (x int) using parquet")
    val e = intercept[IllegalArgumentException] {
      sql("load data inpath '/no/such/staging' into table load_err_t")
    }
    assert(e.getMessage.contains("does not exist"))
    sql("drop table load_err_t")
  }
}
