package graft

import graft.sources.DelimitedText
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Conformance with the reference's QueryTest/hdfs-text-scan.test over
  * its OWN data files (testdata/data/table_no_newline.csv,
  * table_missing_columns.csv): a text file whose last record has no
  * trailing newline still yields that record; empty lines are all-NULL
  * rows, short rows NULL-pad the missing trailing columns
  * (text-converter/delimited-text-parser semantics — Spark's CSV
  * reader drops blank lines, so the engine's DelimitedText scanner is
  * the conforming path). The partitioned variant
  * (table_no_newline_part: the 5-row file in year=2010, the 6-row
  * ragged file in year=2015) reproduces the reference's count grid.
  */
class TextScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("col_1", BooleanType),
    StructField("col_2", DoubleType), StructField("col_3", TimestampType)))

  private val data = "/root/reference/testdata/data"

  private def noNewline: DataFrame =
    DelimitedText.read(spark, s"$data/table_no_newline.csv", schema,
      sep = ',', esc = '\\')

  /** year=2010/month=3 -> table_no_newline.csv;
    * year=2015/month=3 -> table_missing_columns.csv (the reference's
    * partition layout, functional_schema_template.sql:1588-1595).
    */
  private def partTable: DataFrame = {
    def part(file: String, y: Int, m: Int): DataFrame =
      DelimitedText.read(spark, s"$data/$file", schema, sep = ',', esc = '\\')
        .withColumn("year", lit(y)).withColumn("month", lit(m))
    part("table_no_newline.csv", 2010, 3)
      .unionAll(part("table_missing_columns.csv", 2015, 3))
  }

  test("hdfs-text-scan.test: missing trailing newline keeps the last record") {
    assert(noNewline.count() == 5)
    assert(noNewline.select(count(col("col_3"))).collect()(0).getLong(0) == 5)
  }

  test("hdfs-text-scan.test: partitioned counts with ragged/empty rows") {
    val t = partTable
    assert(t.count() == 11)
    assert(t.filter(col("year") === 2015).select(count(col("year")))
      .collect()(0).getLong(0) == 6)
    assert(t.filter(col("year") === 2015).select(count(col("col_3")))
      .collect()(0).getLong(0) == 3)
    assert(t.select(col("year")).distinct().orderBy(col("year"))
      .collect().map(_.getInt(0)).toSeq == Seq(2010, 2015))
    // the reference's per-column count grid: the empty line is an
    // all-NULL row, short rows NULL their missing tail columns
    val grid = t.select(count(col("id")), count(col("col_1")),
      count(col("col_2")), count(col("col_3")), count(col("year")),
      count(col("month"))).collect()(0)
    assert((0 until 6).map(grid.getLong) == Seq(10, 10, 9, 8, 11, 11))
    val byYear = t.groupBy(col("year")).count().orderBy(col("year"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(byYear == Seq((2010, 5L), (2015, 6L)))
  }

  test("hidden-files.test: underscore/dot-prefixed files never scan") {
    // the reference's scanners skip hidden files in a table dir
    // (hidden-files.test: _hidden, .hidden alongside data); Spark's
    // file index applies the same rule — prove it end to end
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_hidden_files")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(dir)
    import spark.implicits._
    Seq(1, 2, 3).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir.getPath)
    // drop garbage beside the data: must be invisible to the scan
    for (n <- Seq("_hidden", ".hidden", "_junk.parquet", ".junk.parquet")) {
      val w = new java.io.FileWriter(new java.io.File(dir, n))
      w.write("not parquet at all"); w.close()
    }
    val back = spark.read.parquet(dir.getPath)
    assert(back.count() == 3)
    assert(back.select(sum(col("id"))).collect()(0).getLong(0) == 6)
  }
}
