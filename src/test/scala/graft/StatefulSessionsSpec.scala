package graft

import graft.streaming.StatefulSessions
import org.scalatest.funsuite.AnyFunSuite

class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming sessions equal batch sessions minus each user's open tail") {
    val q = StatefulSessions.sessions(spark, TestSpark.sf).writeStream
      .outputMode("append").format("memory").queryName("sess_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batchAll = StatefulSessions.sessionsBatch(spark, TestSpark.sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // Every streamed session must be a real batch session; every session
      // closed by a follow-up event (i.e. all but each user's last) must
      // have been emitted. The user's final session may or may not flush,
      // depending on where the watermark (max event_time - 1h) lands
      // relative to its timeout.
      val lastPerUser = batchAll.groupBy(_._1).view
        .mapValues(_.maxBy(_._2)).values.toSet
      val mustEmit = batchAll.toSet -- lastPerUser
      assert(streamed.subsetOf(batchAll.toSet))
      assert(mustEmit.subsetOf(streamed))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("watermark jump past the gap with a marginally-late event does not crash") {
    // same bug class as StreamNearDedup's horizon timeout: rows are
    // admitted against the PREVIOUS batch's watermark, timeouts are
    // validated against the CURRENT one. With no-data micro-batches
    // off (the back-to-back shape of a continuously fed stream), a
    // batch whose predecessor advanced the watermark 9 hours admits an
    // event at t0+2h; its open session's unclamped last+gap timeout
    // (t0+2.5h) is then below the eviction watermark (t0+9h) and the
    // query dies. The clamp keeps the timeout strictly ahead.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    val base = hourUs * 24
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val input = MemoryStream[(Long, Long)]
      val evs = input.toDF().toDF("user_id", "ts_us")
        .withColumn("value", lit(0.0))
        .withColumn("event_time", timestamp_micros(col("ts_us")))
      val q = StatefulSessions.pipeline(evs).writeStream
        .outputMode("append").format("memory").queryName("sess_wmjump").start()
      try {
        for (c <- Seq(
            Seq((1L, base)),                  // user 1 opens a session
            Seq((2L, base + 10 * hourUs)),    // watermark jumps ~9h
            Seq((1L, base + 2 * hourUs)))) {  // marginally-late, admitted
          input.addData(c: _*); q.processAllAvailable()
        }
        // the late event closed user 1's first session (2h > 30min gap)
        val got = spark.table("sess_wmjump").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
        assert(got.contains((1L, base, 1L)), got.toString)
      } finally q.stop()
    } finally spark.conf.set(key, prev)
  }

  test("skewed user: 100k events in one micro-batch, no group buffering") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // one hot user, events 1 hour apart (> the 30 min gap): every event
    // closes the previous session, so 100k events -> 99_999 sessions of
    // one event each flow through the lazy iterator in a single batch
    val n = 100000
    val hourUs = 3600L * 1000000L
    val base = hourUs * 24 // off epoch zero: ts=0 is "late" vs watermark 0
    val input = MemoryStream[(Long, Long)]
    input.addData((0 until n).map(i => (7L, base + i * hourUs)))
    val evs = input.toDF().toDF("user_id", "ts_us")
      .withColumn("value", lit(0.0))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val q = graft.streaming.StatefulSessions.pipeline(evs).writeStream
      .outputMode("append").format("memory").queryName("sess_skew").start()
    try {
      q.processAllAvailable()
      // 99_999 sessions closed by the next event in batch 0; the open tail
      // never flushes (watermark trails max event time by 1h, which never
      // passes the tail's last + 30min timeout without newer events)
      val rows = spark.table("sess_skew").collect()
      assert(rows.length == n - 1)
      assert(rows.forall(_.getLong(3) == 1L)) // every session has 1 event
      val starts = rows.map(_.getLong(1)).sorted
      assert(starts.head == base && starts.last == base + (n - 2).toLong * hourUs)
    } finally q.stop()
  }
}
