package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-vs-snapshot deduplication — the streaming twin of
  * `operators/DedupOps.bloomIncremental` (engine surface beyond
  * parity; SURVEY.md section 2.8). A continuous ingest flags incoming
  * documents against a FROZEN corpus snapshot, the everyday shape of
  * "is this crawl page already in last month's corpus?".
  *
  * Two strategies, both STATELESS on the stream side (nothing ages,
  * nothing checkpoints beyond the source offsets):
  *
  *  - [[flagVsSnapshotBloom]]: the snapshot's probe keys collapse into
  *    one block-Bloom (the reference's `bloom-filter.h` structure,
  *    [[graft.functions.BlockBloom]]) carried as a literal into the
  *    stream plan — every micro-batch probes it map-side. At 100 TB
  *    the snapshot never re-reads: the ~MB filter is the only state,
  *    and the false-positive tail flows to a batch exact-verify
  *    downstream (`dedup_incremental`'s verify join).
  *  - [[flagVsSnapshotExact]]: a stream-static LEFT OUTER equi-join on
  *    the full content hash. Exact, no false positives; the static
  *    side broadcasts per micro-batch when it fits, so this is right
  *    when the snapshot's hash relation is dim-sized (or bucketed for
  *    co-location at scale).
  */
object StreamSnapshotDedup {

  /** The snapshot's Bloom, built once batch-side (distributed build +
    * OR-merge inside the `bloom_build` aggregate).
    */
  def snapshotBloom(snapshot: DataFrame, logHeapSpace: Int = 20): Array[Byte] =
    snapshot
      .agg(call_function("bloom_build",
        crc32(col("text")).cast("int"), lit(logHeapSpace)).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Map-side membership flag: `maybe_dup` is true for every true
    * duplicate (no false negatives) plus the Bloom's ~0.1%
    * false-positive tail.
    */
  def flagVsSnapshotBloom(stream: DataFrame, bloom: Array[Byte]): DataFrame =
    stream.withColumn("maybe_dup",
      call_function("bloom_find", lit(bloom), crc32(col("text")).cast("int")))

  /** Exact flag via a stream-static left outer join on the content
    * hash; `is_dup` is precise.
    */
  def flagVsSnapshotExact(stream: DataFrame, snapshot: DataFrame): DataFrame = {
    val snapHashes = snapshot.select(md5(col("text")).as("snap_hash")).distinct()
    stream.withColumn("content_hash", md5(col("text")))
      .join(snapHashes, col("content_hash") === col("snap_hash"), "left_outer")
      .withColumn("is_dup", col("snap_hash").isNotNull)
      .drop("snap_hash")
  }
}
