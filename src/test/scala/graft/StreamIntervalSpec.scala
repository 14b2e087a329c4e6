package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin
import graft.streaming.StreamInterval

/** Pins for the streaming interval-overlap join: exact batch
  * equivalence (set equality with overlapJoin) under arbitrary
  * micro-batch splits and arrival orders, single emission per pair
  * (bucket ownership), and bucket-lifetime-bounded state.
  */
class StreamIntervalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (id, side, startNs, endNs) */
  private type Iv = (Long, Int, Long, Long)

  private val Shift = 24
  private val MaxBuckets = 16

  private def replay(rows: Seq[Iv], chunks: Int,
      delay: String): (Seq[(Long, Long, Long)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Int, Long, Long)]
    val name = s"stream_interval_${System.nanoTime()}"
    val q = StreamInterval.overlapMatches(
      input.toDF().toDF("id", "side", "start", "end")
        .select(col("id"), col("side"), col("start"), col("end"),
          (col("end") / 1.0e9).cast("timestamp").as("event_time")),
      watermark = delay, shift = Shift, maxBuckets = MaxBuckets)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var stateRows = -1L
    try {
      rows.grouped(math.max(1, (rows.size + chunks - 1) / chunks))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      // one empty-ish extra batch lets registered timeouts fire
      input.addData((-999L, 0, rows.map(_._4).max + 1L,
        rows.map(_._4).max + 2L))
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    val out = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    spark.catalog.dropTempView(name)
    (out, stateRows)
  }

  private def batchExpect(rows: Seq[Iv]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val a = rows.filter(_._2 == 0).map(r => (r._1, r._3, r._4))
      .toDF("a_id", "a_s", "a_e")
    val b = rows.filter(_._2 == 1).map(r => (r._1, r._3, r._4))
      .toDF("b_id", "b_s", "b_e")
    IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        shift = Shift, maxBuckets = MaxBuckets)
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("ov"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def randomRows(seed: Int, n: Int): Seq[Iv] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      val s = rnd.nextLong(3_000_000_000L)
      // lengths up to ~3 buckets at shift 24; ns on whole ms so the
      // ms-truncated event_time stays exact
      val len = (rnd.nextLong(50) + 1) * 1_000_000L
      (i.toLong, rnd.nextInt(2), s - s % 1_000_000L,
        s - s % 1_000_000L + len)
    }
  }

  test("exact batch equivalence (set equality, no duplicate pairs) " +
    "under arbitrary micro-batch splits, in-order arrival") {
    val rows = randomRows(11, 300).sortBy(_._4)
    val expect = batchExpect(rows)
    assert(expect.nonEmpty, "test corpus produced no overlaps")
    for (chunks <- Seq(1, 4, 13)) {
      val (got, _) = replay(rows, chunks, delay = "0 seconds")
      assert(got.size == got.toSet.size, s"chunks=$chunks duplicate pairs")
      assert(got.toSet == expect, s"chunks=$chunks diverges from batch")
    }
  }

  test("exact batch equivalence under RANDOM arrival order (lateness " +
    "window admits everything)") {
    val rnd = new scala.util.Random(23)
    val rows = rnd.shuffle(randomRows(5, 250))
    val expect = batchExpect(rows)
    val (got, _) = replay(rows, 7, delay = "1 hour")
    assert(got.size == got.toSet.size, "duplicate pairs")
    assert(got.toSet == expect)
  }

  test("a pair overlapping in many shared buckets is emitted exactly " +
    "once (ownership), including the same-batch case") {
    // two long intervals sharing ~3 buckets
    val rows: Seq[Iv] = Seq(
      (1L, 0, 0L, 40_000_000L),
      (2L, 1, 10_000_000L, 50_000_000L))
    val (same, _) = replay(rows, 1, delay = "0 seconds")
    assert(same == Seq((1L, 2L, 30_000_000L)), same.toString)
    val (split, _) = replay(rows, 2, delay = "1 hour")
    assert(split == Seq((1L, 2L, 30_000_000L)), split.toString)
  }

  test("watermark jumping far past the horizon in one batch does not " +
    "crash (timeout clamp) and still emits the straggler's pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Int, Long, Long)]
    val name = s"stream_interval_jump_${System.nanoTime()}"
    val q = StreamInterval.overlapMatches(
      input.toDF().toDF("id", "side", "start", "end")
        .select(col("id"), col("side"), col("start"), col("end"),
          (col("end") / 1.0e9).cast("timestamp").as("event_time")),
      watermark = "10 seconds", shift = Shift, maxBuckets = MaxBuckets)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1L, 0, 0L, 20_000_000L))
      q.processAllAvailable()
      // the watermark jumps ~11 days while a marginally-late partner
      // lands in the SAME batch — the unclamped-timeout crash shape
      input.addData((2L, 1, 5_000_000L, 25_000_000L),
        (3L, 0, 1_000_000_000_000_000L, 1_000_000_001_000_000L))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 2L, 15_000_000L)), got.toString)
    } finally { q.stop(); spark.catalog.dropTempView(name) }
  }

  test("bucket state dies one horizon past its end: early buckets are " +
    "gone after the stream moves on") {
    // cluster 1 near t=0; cluster 2 three orders of magnitude later
    val c1 = randomRows(31, 120)
    val c2 = randomRows(37, 40).map(r =>
      (r._1 + 1000L, r._2, r._3 + 3_000_000_000_000L,
        r._4 + 3_000_000_000_000L))
    val (got, stateRows) = replay(c1.sortBy(_._4) ++ c2.sortBy(_._4),
      4, delay = "0 seconds")
    assert(got.toSet == batchExpect(c1 ++ c2))
    // surviving state <= cluster-2's own bucket count (+ sentinel):
    // cluster-1 buckets all timed out
    val c2Buckets = c2.flatMap(r => (r._3 >> Shift) to (r._4 >> Shift))
      .distinct.size
    assert(stateRows >= 0 && stateRows <= c2Buckets + 2,
      s"state $stateRows exceeds live-bucket bound $c2Buckets + 2")
  }
}
