package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BlockBloom

class BlockBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("no false negatives, kernel level") {
    val logSpace = 16
    val dir = new Array[Long](BlockBloom.directoryLongs(logSpace))
    val rnd = new scala.util.Random(7)
    val members = Array.fill(5000)(rnd.nextInt())
    members.foreach(BlockBloom.insert(dir, logSpace, _))
    assert(members.forall(BlockBloom.find(dir, logSpace, _)))
    // serialized probe agrees with the long-array probe
    val bytes = BlockBloom.serialize(dir, logSpace)
    assert(members.forall(BlockBloom.findBytes(bytes, _)))
  }

  test("false positive rate bounded near the reference's published curve") {
    // 64 KiB directory, 5000 ndv -> ~13 bits/ndv; bloom-filter.h's header
    // quotes ~0.1% at 15 b/ndv and 10% at 5 b/ndv. Allow generous slack.
    val logSpace = 16
    val dir = new Array[Long](BlockBloom.directoryLongs(logSpace))
    val rnd = new scala.util.Random(11)
    val members = (0 until 5000).map(_ => rnd.nextInt()).toSet
    members.foreach(BlockBloom.insert(dir, logSpace, _))
    var fp = 0
    var probes = 0
    while (probes < 20000) {
      val x = rnd.nextInt()
      if (!members.contains(x)) {
        if (BlockBloom.find(dir, logSpace, x)) fp += 1
        probes += 1
      }
    }
    val rate = fp.toDouble / probes
    assert(rate < 0.02, s"false positive rate $rate")
  }

  test("distributed build merges by OR: partition layout is irrelevant") {
    import spark.implicits._
    val ds = (1 to 4000).map(i => i * 2654435761L.toInt).toDF("h")
    val a = ds.coalesce(1)
      .agg(call_function("bloom_build", col("h"), lit(14)))
      .head().getAs[Array[Byte]](0)
    val b = ds.repartition(13)
      .agg(call_function("bloom_build", col("h"), lit(14)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("bloom_find over SQL: members always hit, non-members mostly miss") {
    Engine.register(spark, TestSpark.sf)
    val r = Engine.sql(spark, TestSpark.sf,
      """WITH bf AS (SELECT bloom_build(cast(crc32(text) as int), 16) b
        |            FROM documents)
        |SELECT
        |  sum(case when bloom_find(b, cast(crc32(text) as int))
        |      then 1 else 0 end) hits,
        |  count(*) n
        |FROM documents, bf""".stripMargin).head()
    assert(r.getLong(0) === r.getLong(1)) // every inserted key found
  }

  test("dedup_incremental's bloom broadcast materializes ONCE at runtime") {
    // the static plan references `probed` (batch x broadcast(bloom))
    // from both union branches, so pre-AQE it shows two
    // BroadcastExchange builds; at stage materialization AQE's exchange
    // reuse must dedup them — the final adaptive plan either contains a
    // ReusedExchange or repeats one BroadcastQueryStage id. If this pin
    // ever breaks, persist `probed` instead (DedupOps scaladoc).
    val df = SparkEntry.queries("dedup_incremental")(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val stageIds = "BroadcastQueryStage-?(\\d+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(p.contains("ReusedExchange") ||
      stageIds.size > stageIds.distinct.size, p)
  }

  test("dedup_incremental equals the plain exact join") {
    val got = SparkEntry.queries("dedup_incremental")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val docs = Engine.table(spark, TestSpark.sf, "documents")
    val snap = docs.filter(col("doc_id") % 10 < 7)
      .select(md5(col("text")).as("sch")).distinct()
    val want = docs.filter(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), md5(col("text")).as("ch"))
      .join(snap, col("ch") === col("sch"), "left_outer")
      .select(col("doc_id"), col("sch").isNotNull.as("is_dup"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }
}
