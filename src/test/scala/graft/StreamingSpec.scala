package graft

import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming extension must agree with the equivalent batch query
  * when the finite directory is fully consumed.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed stream counts match the batch equivalent") {
    import org.apache.spark.sql.functions._
    val q = EventStream.runToMemorySink(spark, TestSpark.sf, "ev_win_test")
    try {
      val streamed = spark.table("ev_win_test")
        .select(col("w_start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = Engine.table(spark, TestSpark.sf, "events")
        .withColumn("event_time",
          timestamp_micros((col("ts") / 1000).cast("long")))
        .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join") {
    val q = EventStream.attributionJoin(spark, TestSpark.sf).writeStream
      .outputMode("append").format("memory").queryName("attr_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = EventStream
        .attributionJoin(spark, TestSpark.sf, streaming = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
