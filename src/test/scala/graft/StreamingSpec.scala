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

  test("streaming exact dedup drops re-delivered events within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    val input = MemoryStream[(Long, Long)]
    // batch 0: events 0..99, each delivered 3 times
    input.addData((0 until 100).flatMap(i =>
      Seq.fill(3)((i.toLong, hourUs * 24 + i * 1000000L))))
    val evs = input.toDF().toDF("event_id", "ts_us")
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val q = EventStream.dedupStream(evs, "event_id").writeStream
      .outputMode("append").format("memory").queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      // batch 1: a late re-delivery of event 50 inside the watermark
      input.addData(Seq((50L, hourUs * 24 + 50 * 1000000L)))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0))
      assert(ids.length === 100) // each event exactly once
      assert(ids.toSet === (0L until 100L).toSet)
    } finally q.stop()
  }

  test("streaming document dedup: cross-batch duplicates collapse to one pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    input.addData(Seq((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc")))
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamDedup.dedupExact(docs).writeStream
      .outputMode("append").format("memory").queryName("doc_dedup").start()
    try {
      q.processAllAvailable()
      // a later micro-batch re-delivers a known payload and adds a new one
      input.addData(Seq((4L, "beta doc"), (5L, "gamma doc")))
      q.processAllAvailable()
      val texts = spark.table("doc_dedup").collect().map(_.getString(1)).sorted
      assert(texts.toSeq == Seq("alpha doc", "beta doc", "gamma doc"))
    } finally q.stop()
  }

  test("streaming document dedup over the static table matches batch distinct") {
    val q = graft.streaming.StreamDedup
      .dedupDocumentsOnce(spark, TestSpark.sf).writeStream
      .outputMode("append").format("memory").queryName("doc_dedup_once").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("doc_dedup_once").count()
      val batch = Engine.table(spark, TestSpark.sf, "documents")
        .select(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text"))).distinct().count()
      assert(streamed == batch)
      assert(streamed > 0)
    } finally q.stop()
  }

  test("streaming dedup within a watermark horizon bounds its state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    val input = MemoryStream[(Long, String, Long)]
    input.addData(Seq(
      (1L, "dup doc", hourUs * 24),
      (2L, "dup doc", hourUs * 24 + 1000000L), // within horizon: dropped
      (3L, "solo doc", hourUs * 24)))
    val docs = input.toDF().toDF("doc_id", "text", "ts_us")
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val q = graft.streaming.StreamDedup
      .dedupWithinWatermark(docs, "1 hour").writeStream
      .outputMode("append").format("memory").queryName("doc_dedup_wm").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("doc_dedup_wm").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("stream-vs-snapshot dedup: stateless Bloom flag has no false negatives; exact join matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    Engine.configure(spark)
    val docs = Engine.table(spark, TestSpark.sf, "documents")
    val snapshot = docs.filter(col("doc_id") % 10 < 7)
    // the incoming "crawl": the other 30%, so true dups are exactly the
    // rows whose text also occurs in the snapshot (the batch oracle of
    // dedup_incremental)
    val organic = docs.filter(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // plant guaranteed re-crawls: two snapshot payloads re-arrive under
    // fresh ids (organic cross-split duplicates need not exist at every SF)
    val replayed = snapshot.select(col("text")).limit(2).collect()
      .zipWithIndex.map { case (r, i) => (900000L + i, r.getString(0)) }.toSeq
    val incoming = organic ++ replayed
    val expected = {
      val snapTexts = snapshot.select(md5(col("text"))).collect()
        .map(_.getString(0)).toSet
      incoming.map { case (id, t) =>
        id -> snapTexts.contains(
          java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }.toMap
    }

    val bloom = graft.streaming.StreamSnapshotDedup.snapshotBloom(snapshot)
    val input = MemoryStream[(Long, String)]
    input.addData(incoming)
    val stream = input.toDF().toDF("doc_id", "text")
    val qb = graft.streaming.StreamSnapshotDedup
      .flagVsSnapshotBloom(stream, bloom)
      .select(col("doc_id"), col("maybe_dup"))
      .writeStream.outputMode("append").format("memory")
      .queryName("snap_bloom").start()
    val qe = graft.streaming.StreamSnapshotDedup
      .flagVsSnapshotExact(stream, snapshot)
      .select(col("doc_id"), col("is_dup"))
      .writeStream.outputMode("append").format("memory")
      .queryName("snap_exact").start()
    try {
      qb.processAllAvailable(); qe.processAllAvailable()
      val bloomFlags = spark.table("snap_bloom").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val exactFlags = spark.table("snap_exact").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(exactFlags === expected)
      // the Bloom may over-flag (false positives) but NEVER under-flags
      expected.foreach { case (id, dup) =>
        if (dup) assert(bloomFlags(id), s"doc $id: Bloom false negative")
      }
      assert(expected.exists(_._2), "fixture has no true duplicates")
      // the Bloom plan is stateless: no state-store operators
      assert(!qb.lastProgress.toString.contains("stateOperators\" : [ {"))
    } finally { qb.stop(); qe.stop() }
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
