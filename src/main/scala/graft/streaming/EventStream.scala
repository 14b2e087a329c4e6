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
    val schema = Engine.table(spark, dir, "events").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
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
}
