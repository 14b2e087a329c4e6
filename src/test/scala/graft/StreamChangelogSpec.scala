package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangeOps
import graft.streaming.StreamChangelog

/** Pins for streaming changelog resolution: the final emission per key
  * equals the batch last-writer-wins window under any micro-batch
  * split, state is bounded by distinct keys, and feeding the resolved
  * ops into the batch apply step reproduces applyChangelog exactly.
  */
class StreamChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def replay(log: Seq[(Long, Long, String, String)], splits: Int)
      : (Map[Long, (Long, String, String)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val name = s"cl_test_${System.nanoTime()}"
    val input = MemoryStream[(Long, Long, String, String)]
    val q = StreamChangelog.resolved(
        input.toDF().toDF("key", "seq", "op", "payload"))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    var stateRows = -1L
    try {
      log.grouped(math.max(1, (log.size + splits - 1) / splits))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    // last emission per key = the row with the max (seq, op) — winners
    // are monotone in that order, so max over emissions IS the last
    val fin = spark.table(name)
      .withColumn("rn", row_number().over(Window.partitionBy(col("key"))
        .orderBy(col("seq").desc, col("op").desc)))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        r.getString(3))).toMap
    spark.catalog.dropTempView(name)
    (fin, stateRows)
  }

  private val rnd = new scala.util.Random(17)
  private val log: Seq[(Long, Long, String, String)] =
    Seq.tabulate(300) { i =>
      (rnd.nextInt(40).toLong, i.toLong,
        if (rnd.nextBoolean()) "upsert" else "delete", s"p$i")
    }

  test("final resolution equals the batch window for 1-way and 5-way " +
    "splits; state = distinct keys") {
    val want = log.groupBy(_._1).map { case (k, ops) =>
      val b = ops.maxBy(o => (o._2, o._3))
      k -> (b._2, b._3, b._4)
    }
    val (one, _) = replay(log, 1)
    val (five, st) = replay(log, 5)
    assert(one == want)
    assert(five == want)
    assert(st == log.map(_._1).distinct.size.toLong)
  }

  test("resolved stream + batch apply == applyChangelog on the full log") {
    import spark.implicits._
    val snap = (0L to 50L).map(i => i -> s"v$i").toDF("key", "payload")
    val (fin, _) = replay(log, 4)
    val resolvedDf = fin.toSeq.map { case (k, (seq, op, p)) =>
      (k, seq, op, p) }.toDF("key", "seq", "op", "payload")
    val viaStream = ChangeOps.applyChangelog(snap, resolvedDf, "key")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val direct = ChangeOps.applyChangelog(snap,
        log.toDF("key", "seq", "op", "payload"), "key")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaStream == direct)
  }
}
