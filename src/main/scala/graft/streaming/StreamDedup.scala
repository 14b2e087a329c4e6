package graft.streaming

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental twin of
  * `operators/DedupOps.exact` (engine surface beyond parity; the
  * reference has no streaming subsystem, SURVEY.md section 2.8).
  *
  * Shape for a training-data ingest at 100 TB/day: documents arrive as
  * an append-only stream, each keyed by a content hash computed
  * map-side; duplicates must be dropped across micro-batches without
  * unbounded state. Two built-in strategies:
  *
  *  - [[dedupExact]]: `dropDuplicates(content_hash)` — keyed state
  *    lives in the state store (partitioned by hash, no driver
  *    memory), grows with the number of DISTINCT documents. Right when
  *    the corpus-wide key set is bounded.
  *  - [[dedupWithinWatermark]]: `dropDuplicatesWithinWatermark` — state
  *    is dropped once the watermark passes, so memory is bounded by
  *    the dedup HORIZON (duplicates land close together in event time:
  *    the retry/re-crawl case). The scale default.
  */
object StreamDedup {

  /** Content-hash the incoming documents (same md5 key as the batch
    * operator, computed map-side — fuses into the scan).
    */
  private def hashed(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))

  /** Global exact dedup: every distinct content hash passes exactly
    * once, for the stream's lifetime.
    */
  def dedupExact(docs: DataFrame): DataFrame =
    hashed(docs).dropDuplicates("content_hash")

  /** Horizon-bounded dedup: duplicates within `horizon` of each other
    * (event-time column `event_time`) are dropped; state ages out with
    * the watermark.
    */
  def dedupWithinWatermark(docs: DataFrame, horizon: String): DataFrame =
    hashed(docs)
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Convenience: run the exact variant over the static documents table
    * as a one-batch stream (the pattern EventStream established) and
    * return the deduped batch result for inspection.
    */
  def dedupDocumentsOnce(spark: SparkSession, dir: String): DataFrame = {
    Engine.configure(spark)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    dedupExact(stream)
  }
}
