package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FunnelOps
import graft.streaming.StreamFunnel

/** Pins for the streaming funnel twin: the emitted (user, stage, t,
  * lag) conversion rows equal the batch funnelStages relations (set
  * equality, single emission) under arbitrary micro-batch splits and
  * arrival orders, and state stays users-bounded.
  */
class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Stages = Seq("signup", "view", "click", "purchase")
  private val Cap = 2L * 86400000000000L

  // (user, type, tsn) — tsn is ns, ms-aligned so event_time is its
  // exact ms truncation (the twin's input contract)
  private type Ev = (Long, String, Long)

  private def replay(rows: Seq[Ev], chunks: Int,
      delay: String): (Seq[(Long, Int, Long, Long)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val name = s"stream_funnel_${System.nanoTime()}"
    val q = StreamFunnel.conversions(
      input.toDF().toDF("user_id", "event_type", "tsn")
        .select(col("user_id"), col("event_type"), col("tsn"),
          timestamp_micros(expr("tsn div 1000")).as("event_time")),
      Stages, Cap, watermark = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var stateRows = -1L
    try {
      rows.grouped(math.max(1, (rows.size + chunks - 1) / chunks))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      // sentinel user far in the future: flushes every real buffer
      val farNs = rows.map(_._3).max + 40L * 86400000000000L
      input.addData((999999L, "signup", farNs))
      q.processAllAvailable()
      input.addData((999999L, "signup", farNs + 1000000L))
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    val out = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.filter(_._1 != 999999L)
    spark.catalog.dropTempView(name)
    (out, stateRows)
  }

  /** Sequential per-user chain (the FunnelOpsSpec recompute, keeping
    * each conversion row).
    */
  private def brute(rows: Seq[Ev]): Set[(Long, Int, Long, Long)] = {
    val out = Set.newBuilder[(Long, Int, Long, Long)]
    rows.groupBy(_._1).foreach { case (u, es) =>
      var t = Long.MinValue
      var alive = true
      Stages.zipWithIndex.foreach { case (st, i) =>
        if (alive) {
          val cand = es.filter(e => e._2 == st &&
            (i == 0 || (e._3 > t && e._3 - t <= Cap))).map(_._3)
          if (cand.isEmpty) alive = false
          else {
            val nt = cand.min
            out += ((u, i + 1, nt, if (i == 0) 0L else nt - t))
            t = nt
          }
        }
      }
    }
    out.result()
  }

  private def randomRows(seed: Int, n: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val types = Stages ++ Seq("noise")
    Seq.fill(n) {
      val u = rnd.nextInt(20).toLong
      val tp = types(rnd.nextInt(types.size))
      // ms-aligned ns over ~10 days
      val tsn = (rnd.nextLong(10L * 86400000L)) * 1000000L
      (u, tp, tsn)
    }.distinct
  }

  test("emitted conversions equal the batch chain under arbitrary " +
    "splits, each (user, stage) exactly once") {
    val rows = randomRows(7, 800).sortBy(_._3)
    val want = brute(rows)
    for (chunks <- Seq(1, 5, 9)) {
      val (got, _) = replay(rows, chunks, delay = "0 seconds")
      assert(got.size == got.toSet.size, s"chunks=$chunks duplicates")
      assert(got.toSet == want, s"chunks=$chunks diverges from batch")
    }
  }

  test("random arrival order with a lateness window that admits " +
    "everything still equals batch") {
    val rnd = new scala.util.Random(31)
    val rows = rnd.shuffle(randomRows(19, 600))
    val (got, _) = replay(rows, 7, delay = "30 days")
    assert(got.toSet == brute(rows))
  }

  test("sf0.001 corpus: stream conversions equal the batch " +
    "funnelStages relations; state is users-bounded") {
    Engine.configure(spark)
    val d = "/root/testdata/sf0.001"
    val raw = Engine.table(spark, d, "events")
      .selectExpr("user_id", "event_type", "ts - ts % 1000 AS tsn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3).toSeq
    val (got, stateRows) = replay(raw, 8, delay = "0 seconds")
    // batch reference: the funnelStages relations themselves
    val ev = Engine.table(spark, d, "events")
      .selectExpr("user_id", "event_type", "ts - ts % 1000 AS tsn")
    val sts = FunnelOps.funnelStages(ev, Stages, Cap)
    val want = sts.head.collect()
      .map(r => (r.getLong(0), 1, r.getLong(1), 0L)).toSet ++
      sts.zipWithIndex.drop(1).flatMap { case (st, i) =>
        st.collect().map(r => (r.getLong(0), i + 1, r.getLong(2),
          r.getLong(2) - r.getLong(1)))
      }.toSet
    assert(got.toSet == want)
    val users = raw.map(_._1).distinct.size
    assert(stateRows >= 0 && stateRows <= users + 1,
      s"state $stateRows exceeds users=$users (+sentinel)")
  }
}
