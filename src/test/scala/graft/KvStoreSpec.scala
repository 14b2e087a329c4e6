package graft

import graft.sources.KvStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Keyed-store sink + scan round trip: the HBase table sink / scan
  * analog (SURVEY 2.2), idempotent keyed puts and start/stop-row range
  * pushdown.
  */
class KvStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fmt = "graft.sources.KvStoreSink"

  private def readBack(table: String) =
    spark.read.format(fmt).option("table", table).load()

  test("write/read round trip preserves rows keyed and sorted") {
    KvStore.drop("rt")
    import spark.implicits._
    val df = Seq((5L, 1.5, "a"), (1L, 2.5, "b"), (9L, 0.5, null))
      .toDF("key", "val", "tag")
    df.write.format(fmt).option("table", "rt").mode("append").save()
    val got = readBack("rt").collect().map(r =>
      (r.getLong(0), r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))
    // sorted-by-key scan order, null tag preserved
    assert(got.toSeq === Seq((1L, 2.5, "b"), (5L, 1.5, "a"), (9L, 0.5, null)))
  }

  test("puts are idempotent by key: rewrites replace, last write wins") {
    KvStore.drop("idem")
    import spark.implicits._
    Seq((1L, 1.0, "old"), (2L, 2.0, "keep")).toDF("key", "val", "tag")
      .write.format(fmt).option("table", "idem").mode("append").save()
    Seq((1L, 10.0, "new")).toDF("key", "val", "tag")
      .write.format(fmt).option("table", "idem").mode("append").save()
    val got = readBack("idem").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got === Seq((1L, 10.0, "new"), (2L, 2.0, "keep")))
  }

  test("overwrite mode truncates the store first") {
    KvStore.drop("trunc")
    import spark.implicits._
    Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("key", "val", "tag")
      .write.format(fmt).option("table", "trunc").mode("append").save()
    Seq((7L, 7.0, "z")).toDF("key", "val", "tag")
      .write.format(fmt).option("table", "trunc").mode("overwrite").save()
    assert(readBack("trunc").collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("key range conjuncts push into sorted sub-map bounds") {
    KvStore.drop("range")
    import spark.implicits._
    (0L until 1000L).map(i => (i, i * 0.5, "t" + (i % 3))).toDF("key", "val", "tag")
      .write.format(fmt).option("table", "range").mode("append").save()
    val df = readBack("range").filter(col("key") >= 100 && col("key") < 200)
    // accepted conjuncts become scan bounds; no residual Filter node
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[100, 199]"), p)
    assert(!p.linesIterator.exists(l =>
      !l.contains("BatchScan") && l.contains("Filter") && l.contains("key#")), p)
    assert(df.count() === 100)
    // a fact-table join against the store stays correct
    val fact = (150L until 250L).map(i => (i, i.toString)).toDF("key", "name")
    val joined = readBack("range").join(fact, "key")
    assert(joined.count() === 100)
  }

  test("large write from a real table round-trips through the store") {
    KvStore.drop("agg")
    val orders = Engine.table(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").as("val"),
        col("o_orderstatus").as("tag"))
    orders.write.format(fmt).option("table", "agg").mode("append").save()
    val n = orders.count()
    assert(readBack("agg").count() === n)
    // grouped verify: per-tag sums agree between source table and store
    val a = orders.groupBy("tag")
      .agg(sum(col("val").cast("decimal(18,2)")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val b = readBack("agg").groupBy("tag")
      .agg(sum(col("val").cast("decimal(18,2)")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(a === b)
  }
}
