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
