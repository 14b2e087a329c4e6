package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOhlc

/** Pins for the streaming OHLC twin: emitted bars equal the batch
  * entry (set equality, single emission — including the EXACT double
  * sum_value) under arbitrary micro-batch splits and arrival orders,
  * same-timestamp ties break by event_id exactly like the batch
  * min_by/max_by key, and state holds in-flight days only.
  */
class StreamOhlcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val DayMs = 86400000L
  private val DayNs = 86400000000000L

  // (event_id, tsn, value); day/event_time derive from tsn
  private type Ev = (Long, Long, Double)

  private def replay(rows: Seq[Ev], chunks: Int,
      delay: String): (Seq[(Long, Long, Double, Double, Double, Double,
        Double)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Double)]
    val name = s"stream_ohlc_${System.nanoTime()}"
    val q = StreamOhlc.dailyBars(
      input.toDF().toDF("event_id", "tsn", "value")
        .select(expr("tsn div " + DayNs).as("day"), col("tsn"),
          col("event_id"), col("value"),
          (col("tsn") / 1.0e9).cast("timestamp").as("event_time")),
      watermark = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var stateRows = -1L
    try {
      rows.grouped(math.max(1, (rows.size + chunks - 1) / chunks))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      // far-future sentinel completes every real day (its own bar
      // stays in state — 1 residual row)
      val farNs = (rows.map(_._2).max / DayNs + 40L) * DayNs + 1000L
      input.addData((Long.MaxValue - 1L, farNs, 0.0))
      q.processAllAvailable()
      input.addData((Long.MaxValue - 2L, farNs + 1000L, 0.0))
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    val out = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toSeq
    spark.catalog.dropTempView(name)
    (out, stateRows)
  }

  /** Sequential batch reference of the entry's exact semantics. */
  private def brute(rows: Seq[Ev])
      : Set[(Long, Long, Double, Double, Double, Double, Double)] =
    rows.groupBy(_._2 / DayNs).map { case (day, v) =>
      val open = v.minBy(e => (e._2, e._1))._3
      val close = v.maxBy(e => (e._2, e._1))._3
      val cents = v.map(e => BigDecimal(e._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
        .map(_.toLongExact).sum
      (day, v.size.toLong, open, v.map(_._3).max, v.map(_._3).min,
        close, cents / 100.0)
    }.toSet

  private def randomRows(seed: Int, n: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val day = rnd.nextInt(9).toLong
      // µs-aligned tsn with deliberate collisions (small slot count);
      // +1µs keeps day 0 off event_time == epoch 0: Spark's stateful
      // late filter drops rows with event_time <= the watermark µs,
      // and the INITIAL watermark is 0, so the very first µs of the
      // epoch is unreachable (probed; a harness artifact only — real
      // corpora sit decades from epoch)
      val tsn = day * DayNs + rnd.nextInt(50) * 1000000L + 1000L
      (i.toLong, tsn, (rnd.nextInt(99999) - 20000) / 100.0)
    }
  }

  test("emitted bars equal the batch reference under arbitrary " +
    "splits — exact double sum included, each day exactly once") {
    val rows = randomRows(71, 600).sortBy(_._2)
    val want = brute(rows)
    for (chunks <- Seq(1, 5, 11)) {
      val (got, _) = replay(rows, chunks, delay = "0 seconds")
      assert(got.size == got.toSet.size, s"chunks=$chunks duplicate bars")
      assert(got.toSet == want, s"chunks=$chunks diverges from batch")
    }
  }

  test("random arrival order with a lateness window that admits " +
    "everything still equals batch; state holds in-flight days only") {
    val rnd = new scala.util.Random(5)
    val rows = rnd.shuffle(randomRows(29, 400))
    val (got, stateRows) = replay(rows, 7, delay = "30 days")
    assert(got.toSet == brute(rows))
    // all real days emitted and removed; only the sentinel day remains
    assert(stateRows == 1L, s"stateRows=$stateRows")
  }

  test("same-tsn ties: open takes the smaller event_id, close the " +
    "larger — the batch min_by/max_by struct key") {
    val d0 = 3L * DayNs
    val rows = Seq[Ev](
      (10L, d0, 7.25), (2L, d0, 9.0),          // open tie -> id 2
      (5L, d0 + 1000000L, 3.75),
      (7L, d0 + 2000000L, 1.5), (4L, d0 + 2000000L, 8.0)) // close -> id 7
    val (got, _) = replay(rows, 2, delay = "0 seconds")
    assert(got.size == 1)
    val bar = got.head
    assert(bar == ((3L, 5L, 9.0, 9.0, 1.5, 1.5, 29.5)))
  }

  test("twin equals the batch events_ohlc entry at sf0.001") {
    Engine.configure(spark)
    val d = "/root/testdata/sf0.001"
    val rows = Engine.table(spark, d, "events")
      .selectExpr("event_id", "(ts - ts % 1000) AS tsn", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val (got, _) = replay(rows.sortBy(_._2), 6, delay = "0 seconds")
    val want = SparkEntry.queries("events_ohlc")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toSet
    assert(got.toSet == want)
  }
}
