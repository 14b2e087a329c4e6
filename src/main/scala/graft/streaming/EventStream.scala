package graft.streaming

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming extension over the events table.
  *
  * The reference has no streaming subsystem (SURVEY.md section 2.8), so
  * this is engine surface beyond parity: the same `events` schema consumed
  * incrementally — windowed aggregation with watermarked late-data
  * handling, exactly the shape a training-data ingest pipeline runs at
  * scale (`readStream` from an append-only lake directory; here the static
  * parquet stands in as a one-batch stream).
  */
object EventStream {

  /** Event-time 5-minute tumbling window counts per event_type, with a
    * 10-minute watermark. `ts` arrives as epoch-nanos int64 (see Engine)
    * and becomes a proper event-time column here.
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    Engine.configure(spark)
    // readStream needs the FILE's schema (ts may be timestamp-typed in
    // newer testdata); normalizeEventTs restores the int64-nanos contract
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Engine.normalizeEventTs(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
    stream
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  /** Run the windowed aggregation to completion against the (finite)
    * directory and return the result table name in the memory sink.
    */
  def runToMemorySink(spark: SparkSession, dir: String,
      name: String = "event_windows"): StreamingQuery = {
    val q = windowedCounts(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }

  private def eventSide(spark: SparkSession, dir: String, tpe: String,
      alias: String, streaming: Boolean): DataFrame = {
    val src =
      if (streaming) {
        val schema = spark.read.parquet(s"$dir/events.parquet").schema
        Engine.normalizeEventTs(spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
      } else Engine.table(spark, dir, "events")
    src.filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${alias}_user"),
        col("event_id").as(s"${alias}_id"),
        timestamp_micros((col("ts") / 1000).cast("long")).as(s"${alias}_time"))
      .withWatermark(s"${alias}_time", "1 hour")
  }

  /** Streaming exact dedup — the ingest-side twin of DedupOps.exact:
    * duplicate records (same key) are dropped with state bounded by the
    * watermark (`dropDuplicatesWithinWatermark`), so a re-delivered event
    * inside the lateness window dedups while state older than the
    * watermark is evicted — the only viable exact-dedup shape for an
    * unbounded 100 TB/day ingest.
    */
  def dedupStream(evs: DataFrame, key: String): DataFrame =
    evs.withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark(key)

  /** Stream-stream interval join: purchases attributed to the user's
    * clicks in the preceding 30 minutes. Both sides watermarked so the
    * join state is bounded — Spark drops click state once the purchase
    * watermark passes click_time + 30 min (at 100 TB/day the state store
    * holds only the active interval, partitioned by user).
    */
  def attributionJoin(spark: SparkSession, dir: String,
      streaming: Boolean = true): DataFrame = {
    Engine.configure(spark)
    val clicks = eventSide(spark, dir, "click", "click", streaming)
    val buys = eventSide(spark, dir, "purchase", "buy", streaming)
    clicks.join(buys,
      col("click_user") === col("buy_user") &&
        col("buy_time") >= col("click_time") &&
        col("buy_time") <= col("click_time") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_user").as("user_id"), col("click_id"),
        col("buy_id"), col("click_time"), col("buy_time"))
  }
}
