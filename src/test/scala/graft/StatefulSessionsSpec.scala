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
}
