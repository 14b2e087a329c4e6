package graft

import graft.sources.KvRangeSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** External data-source scan: the accepted/residual conjunct contract
  * (ExternalDataSource.thrift accepted_conjuncts parity).
  */
class KvRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def src(rows: Long) =
    spark.read.format("graft.sources.KvRangeSource")
      .option("rows", rows.toString).load()

  test("full scan produces the deterministic keyed range") {
    val rows = src(100).collect()
    assert(rows.length === 100)
    val r42 = rows.find(_.getLong(0) == 42L).get
    assert(r42.getDouble(1) === KvRangeSource.valueOf(42))
    assert(r42.getString(2) === KvRangeSource.tagOf(42))
  }

  test("accepted id conjuncts narrow generation at the source") {
    KvRangeSource.rowsGenerated.set(0)
    val n = src(100000).filter(col("id") >= 500 && col("id") < 1500).count()
    assert(n === 1000)
    // the source generated only the accepted range, not all 100k rows
    assert(KvRangeSource.rowsGenerated.get() === 1000,
      s"generated ${KvRangeSource.rowsGenerated.get()}")
  }

  test("non-id conjuncts stay residual and are engine-evaluated") {
    KvRangeSource.rowsGenerated.set(0)
    val df = src(1000).filter(col("id") < 100 && col("tag") === "t3")
    val p = df.queryExecution.executedPlan.toString
    // tag filter must appear as a residual Filter node above the scan,
    // and the id conjunct must NOT (it was accepted by the source)
    val filterLine = p.linesIterator.find(_.contains("Filter")).getOrElse("")
    assert(filterLine.contains("t3"), p)
    assert(!filterLine.contains("id#"), p)
    val got = df.collect().map(_.getLong(0)).toSet
    val want = (0L until 100L).filter(i => KvRangeSource.tagOf(i) == "t3").toSet
    assert(got === want)
    // generation stopped at the accepted bound: 100 rows, not 1000
    assert(KvRangeSource.rowsGenerated.get() === 100)
  }

  test("column pruning reaches the source") {
    val df = src(1000).select(col("id"))
    val p = df.queryExecution.executedPlan.toString
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("tag"), read)
    assert(df.count() === 1000)
  }

  test("scan splits into parallel partitions") {
    assert(src(1000).rdd.getNumPartitions >= 2)
  }
}
