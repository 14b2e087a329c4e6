package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQuantiles

/** Pins for the streaming rolling-quantile histograms: the emitted
  * merged cells equal the batch RANGE-window merge (set equality,
  * single emission) under arbitrary micro-batch splits and arrival
  * orders, quantiles derived from the stream equal the batch entry,
  * and state stays bucket × ~7-day bounded.
  */
class StreamQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val DayMs = 86400000L

  /** (b, day) event rows -> ms event time inside the day. */
  private type Ev = (Int, Long, Long) // b, day, event_time_ms

  private def replay(rows: Seq[Ev], chunks: Int,
      delay: String): (Seq[(Long, Int, Long)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Int, Long, Long)]
    val name = s"stream_q_${System.nanoTime()}"
    val q = StreamQuantiles.mergedCells(
      input.toDF().toDF("b", "day", "ms")
        .select(col("b"), col("day"),
          (col("ms") / 1000.0).cast("timestamp").as("event_time")),
      watermark = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var stateRows = -1L
    try {
      rows.grouped(math.max(1, (rows.size + chunks - 1) / chunks))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      // sentinel on an unused bucket: completes every real day
      val farDay = rows.map(_._2).max + 40L
      input.addData((255, farDay, farDay * DayMs + 1000L))
      q.processAllAvailable()
      input.addData((255, farDay, farDay * DayMs + 2000L))
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    val out = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.dropTempView(name)
    (out, stateRows)
  }

  /** Batch reference: mc(d, b) = sum of counts over days d-6..d, for
    * d in [minDay, maxDay + 6], mc > 0 cells only.
    */
  private def brute(rows: Seq[Ev]): Set[(Long, Int, Long)] = {
    val cnt = rows.groupBy(e => (e._2, e._1))
      .map { case (k, v) => k -> v.size.toLong }
    val days = rows.map(_._2)
    (days.min to days.max + 6).flatMap { d =>
      rows.map(_._1).distinct.flatMap { b =>
        val mc = (d - 6 to d).map(k => cnt.getOrElse((k, b), 0L)).sum
        if (mc > 0) Some((d, b, mc)) else None
      }
    }.toSet
  }

  private def randomRows(seed: Int, n: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val day = rnd.nextInt(15).toLong
      val b = rnd.nextInt(12)
      (b, day, day * DayMs + 1000L + rnd.nextInt(1000) * 1000L)
    }
  }

  test("emitted merged cells equal the batch 7-day RANGE merge under " +
    "arbitrary splits, each cell exactly once") {
    val rows = randomRows(13, 500).sortBy(_._3)
    val want = brute(rows)
    for (chunks <- Seq(1, 4, 9)) {
      val (got, _) = replay(rows, chunks, delay = "0 seconds")
      assert(got.size == got.toSet.size, s"chunks=$chunks duplicate cells")
      assert(got.toSet == want, s"chunks=$chunks diverges from batch")
    }
  }

  test("random arrival order with a lateness window that admits " +
    "everything still equals batch") {
    val rnd = new scala.util.Random(29)
    val rows = rnd.shuffle(randomRows(7, 400))
    val (got, _) = replay(rows, 6, delay = "30 days")
    assert(got.toSet == brute(rows))
  }

  test("quantiles from the stream's cells equal the batch entry at " +
    "sf0.001, state stays bucket-bounded") {
    Engine.configure(spark)
    val d = "/root/testdata/sf0.001"
    val raw = Engine.table(spark, d, "events")
      .selectExpr("(ts - ts % 1000) div 86400000000000 AS day",
        "cast(least(greatest(floor(value / 2.0), 0), 255) as int) AS b",
        "(ts - ts % 1000) div 1000000 AS ms")
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getLong(2)))
      .sortBy(_._3).toSeq
    val maxDay = raw.map(_._2).max
    val (cells, stateRows) = replay(raw, 8, delay = "0 seconds")
    // derive per-day quantiles from the emitted cells (days in data)
    val byDay = cells.filter(_._1 <= maxDay).groupBy(_._1)
    val fromStream = byDay.map { case (day, cs) =>
      val sorted = cs.sortBy(_._2)
      val n = sorted.map(_._3).sum
      def pq(q: Double): Int = {
        var cum = 0L
        val thr = math.ceil(q * n).toLong
        sorted.collectFirst {
          case (_, b, mc) if { cum += mc; cum >= thr } => b }.get
      }
      day -> ((n, pq(0.50), pq(0.90), pq(0.99)))
    }
    val entry = SparkEntry.queries("stat_rolling_quantiles")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(fromStream == entry)
    // state: <= 256 buckets + sentinel, regardless of corpus size
    assert(stateRows >= 0 && stateRows <= 257,
      s"state $stateRows exceeds the bucket bound")
  }
}
