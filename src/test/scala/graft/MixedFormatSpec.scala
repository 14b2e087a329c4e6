package graft

import graft.sources.MixedFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Per-partition file formats in one table — the reference's
  * `HdfsPartitionDescriptor` carries the format per PARTITION and the
  * scan dispatches a scanner per split (`QueryTest/mixed-format.test`,
  * `be/src/exec/hdfs-scan-node.cc`).
  */
class MixedFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir =
    s"${System.getProperty("java.io.tmpdir")}/graft_mixedspec"

  private lazy val parts = {
    val src = Engine.table(spark, TestSpark.sf, "customer")
    MixedFormat.writeMixed(spark, src, dir, "c_mktsegment",
      Seq("csv", "parquet", "json", "avro"))
  }

  private def dataSchema: StructType = {
    val src = Engine.table(spark, TestSpark.sf, "customer")
    StructType(src.schema.filterNot(_.name == "c_mktsegment"))
  }

  test("mixed-format read equals the single-format source") {
    assert(parts.map(_.format).distinct.size >= 4, parts.toString)
    val got = MixedFormat.read(spark, dir, dataSchema, "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = Engine.table(spark, TestSpark.sf, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("partition pruning happens against the manifest, before any scan") {
    val keep = parts.head.value
    assert(MixedFormat.plannedPartitions(dir, _ == keep) == 1)
    val df = MixedFormat.read(spark, dir, dataSchema, "c_mktsegment",
      _ == keep)
    // exactly one partition scan in the plan — pruned partitions
    // contribute no scan node at all (FE pruning parity, HdfsScanNode)
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size == 1, df.queryExecution.executedPlan.toString)
    assert(df.select(countDistinct(col("c_mktsegment"))).head.getLong(0) == 1)
  }

  test("every format round-trips its partition's rows losslessly") {
    val whole = MixedFormat.read(spark, dir, dataSchema, "c_mktsegment")
    for (p <- parts) {
      val got = whole.filter(col("c_mktsegment") === p.value)
        .agg(count(lit(1)), sum("c_custkey"), sum(col("c_acctbal").cast("decimal(18,2)")))
        .head
      val want = Engine.table(spark, TestSpark.sf, "customer")
        .filter(col("c_mktsegment") === p.value)
        .agg(count(lit(1)), sum("c_custkey"), sum(col("c_acctbal").cast("decimal(18,2)")))
        .head
      assert(got == want, s"partition ${p.value} (${p.format})")
    }
  }
}
