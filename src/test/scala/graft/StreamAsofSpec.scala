package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.streaming.StreamAsof

/** Pins for the streaming AS-OF JOIN: exact batch equivalence under
  * arbitrary micro-batch splits, tie semantics, bounded right-buffer
  * state, and the watermark-jump timeout clamp.
  */
class StreamAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (key, id, side, tsMs) */
  private type Row4 = (Long, Long, Int, Long)

  private def replay(rows: Seq[Row4], chunks: Int, sentinelTs: Long,
      delay: String = "0 seconds"): (Seq[(Long, Option[Long])], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Int, Long)]
    val name = s"stream_asof_${System.nanoTime()}"
    val q = StreamAsof.asofMatches(
      input.toDF().toDF("key", "id", "side", "ms")
        .select(col("key"), col("id"), col("side"),
          (col("ms") / 1000.0).cast("timestamp").as("event_time")),
      watermark = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var stateRows = -1L
    try {
      rows.grouped(math.max(1, (rows.size + chunks - 1) / chunks))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      // sentinel on an unused key pushes the watermark past every row
      input.addData((-999L, -1L, 0, sentinelTs))
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    val out = spark.table(name)
      .select(col("left_id"), col("right_id")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    spark.catalog.dropTempView(name)
    (out, stateRows)
  }

  private def batchExpect(rows: Seq[Row4]): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = rows.filter(_._3 == 1).map(r => (r._2, r._1, r._4))
      .toDF("event_id", "key", "tsn")
    val r = rows.filter(_._3 == 0).map(x => (x._2, x._1, x._4))
      .toDF("view_id", "key", "tsn")
    AsofJoin.asofJoin(l, r, Seq("key"), "tsn",
        Map("view_id" -> "view_id"), tieCol = "view_id")
      .select(col("event_id"), col("view_id")).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
  }

  test("exact batch equivalence under arbitrary micro-batch splits") {
    val rnd = new scala.util.Random(7)
    // ms timestamps on whole seconds: the watermark truncates to ms
    // via timestamp arithmetic, keep it exact
    val rows: Seq[Row4] = Seq.tabulate(400) { i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(2),
        (rnd.nextInt(300) + 1) * 1000L)
    }
    val expect = batchExpect(rows)
    // the watermark must lag every real row until the sentinel: rows
    // are replayed in random event-time order across chunks, and batch
    // equality is only promised for rows admitted within the lateness
    // window — a 2000 s delay admits everything, the sentinel then
    // releases all matches at once
    for (chunks <- Seq(1, 4, 13)) {
      val (got, _) = replay(rows, chunks, sentinelTs = 10_000_000L,
        delay = "2000 seconds")
      assert(got.size == got.toMap.size, "duplicate left emissions")
      assert(got.toMap == expect, s"chunks=$chunks diverges from batch")
    }
  }

  test("equal-ts right is eligible and the largest tie id wins") {
    val rows: Seq[Row4] = Seq(
      (1L, 100L, 1, 50_000L),
      (1L, 10L, 0, 50_000L), (1L, 11L, 0, 50_000L), (1L, 9L, 0, 49_000L))
    val (got, _) = replay(rows, 1, sentinelTs = 10_000_000L)
    assert(got.toMap == Map(100L -> Some(11L)))
  }

  test("right-buffer state is pruned to the dominant row per key") {
    // 200 right rows then one left far in the future: after the
    // watermark passes the rights, state must keep ONE right per key,
    // not the history
    val rights: Seq[Row4] = Seq.tabulate(200)(i =>
      (1L, i.toLong, 0, (i + 1) * 1000L))
    val probe: Seq[Row4] = Seq((1L, 999L, 1, 900_000L))
    val (got, stateRows) = replay(rights ++ probe, 2,
      sentinelTs = 10_000_000L)
    assert(got.toMap == Map(999L -> Some(199L)))
    // sentinel key + (emptied) key 1: a handful of state rows, not 200
    assert(stateRows >= 0 && stateRows <= 4,
      s"state not pruned: $stateRows rows")
  }

  test("events replay (bench row shape): every click emitted once, " +
    "final state bounded by one dominant right per key + in-flight") {
    Engine.configure(spark)
    import spark.implicits._
    val ev = Engine.table(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "click", 1).otherwise(0).as("side"),
        (col("ts") / 1000000L).cast("long").as("ms"))
      .orderBy(col("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSeq
    val nClicks = ev.count(_._3 == 1)
    val nUsers = ev.map(_._1).distinct.size
    val (got, stateRows) = replay(ev, 8, sentinelTs = Long.MaxValue / 2000)
    assert(got.size == nClicks, s"${got.size} of $nClicks clicks emitted")
    assert(got.map(_._1).distinct.size == nClicks, "duplicate emissions")
    // one dominant right per key survives (plus the sentinel's key);
    // pending lefts are all flushed once the watermark passed them
    assert(stateRows >= 0 && stateRows <= nUsers + 1,
      s"state $stateRows exceeds per-key dominant-right bound $nUsers + 1")
  }

  test("left whose event time equals the final watermark is flushed " +
    "without further input (timeout liveness at the boundary)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Int, Long)]
    val name = s"stream_asof_live_${System.nanoTime()}"
    // delay 0: after the only batch the watermark rests EXACTLY on the
    // left's event time. Pre-fix, the timeout was registered AT the
    // event time and event-time timeouts fire only on strict passage,
    // so this row was never emitted unless a later batch arrived (the
    // r11 ADVICE liveness gap, masked by sentinel batches elsewhere).
    val q = StreamAsof.asofMatches(
      input.toDF().toDF("key", "id", "side", "ms")
        .select(col("key"), col("id"), col("side"),
          (col("ms") / 1000.0).cast("timestamp").as("event_time")),
      watermark = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1L, 7L, 0, 40_000L), (1L, 100L, 1, 50_000L))
      q.processAllAvailable()
      // the flush rides the no-data micro-batch; poll briefly
      val deadline = System.nanoTime() + 15_000_000_000L
      while (spark.table(name).count() == 0 &&
          System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      val got = spark.table(name)
        .select(col("left_id"), col("right_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(100L -> 7L),
        "boundary-timestamp left not flushed by its own timeout")
    } finally { q.stop(); spark.catalog.dropTempView(name) }
  }

  test("watermark jumping far past the horizon in one batch does not " +
    "crash (timeout clamp)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val old = spark.conf.getOption(
      "spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val input = MemoryStream[(Long, Long, Int, Long)]
      val name = s"stream_asof_jump_${System.nanoTime()}"
      val q = StreamAsof.asofMatches(
        input.toDF().toDF("key", "id", "side", "ms")
          .select(col("key"), col("id"), col("side"),
            (col("ms") / 1000.0).cast("timestamp").as("event_time")),
        watermark = "10 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData((1L, 1L, 1, 100_000L))
        q.processAllAvailable()
        // watermark jumps ~11 days with a marginally-late straggler in
        // the same batch — the crash shape that killed unclamped
        // stateful operators (NOTES); pins that StreamAsof's timeout
        // discipline survives it
        input.addData((1L, 2L, 1, 1_000_000_000L), (1L, 3L, 0, 99_000L))
        q.processAllAvailable()
        input.addData((-999L, -1L, 0, 2_000_000_000L))
        q.processAllAvailable()
        // with no-data batches disabled, the watermark advance from the
        // first sentinel only registers timeouts — one more batch fires
        // them and flushes the last pending left
        input.addData((-999L, -2L, 0, 2_100_000_000L))
        q.processAllAvailable()
        assert(spark.table(name).count() >= 2)
      } finally {
        q.stop(); spark.catalog.dropTempView(name)
      }
    } finally old match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }
}
