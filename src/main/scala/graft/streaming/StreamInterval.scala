package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.IntervalJoin

/** Streaming INTERVAL-OVERLAP JOIN — the incremental twin of
  * [[graft.operators.IntervalJoin.overlapJoin]] (the fifth streaming
  * twin; SURVEY.md section 2.8): two sides of closed [start, end]
  * int64-ns intervals arrive as ONE tagged stream and every
  * overlapping (a, b) pair is emitted exactly once.
  *
  * Same decomposition as the batch plan: intervals explode map-side to
  * the fixed 2^shift-ns buckets they cover (the EXACT batch
  * `bucketsOf` expression, loud over-wide/inverted guards included),
  * state is keyed BY BUCKET, and a pair is emitted only by its OWNER
  * bucket — the one containing `max(a.start, b.start)` — so no pair is
  * ever emitted twice even though both intervals live in many buckets.
  *
  * Emission is immediate, not watermark-deferred: overlap is MONOTONE
  * (a future row can never invalidate a match, unlike as-of's
  * "latest at-or-before"), so the later-arriving side of a pair emits
  * it on arrival. That makes the emitted SET split-invariant — the pin
  * in StreamIntervalSpec is set equality with the batch join under any
  * micro-batch partitioning, the same equality discipline as the other
  * four twins.
  *
  * State bound: a bucket's buffers hold only intervals covering that
  * bucket, and the whole bucket dies once no future arrival can still
  * overlap in it. With the watermark on interval END time and the
  * batch guard capping interval length at maxBuckets·2^shift ns, any
  * future arrival satisfies start ≥ watermark − maxLen; once the
  * watermark passes bucket_end + maxLen no such arrival can cover the
  * bucket, and its event-time timeout removes ALL its state. State is
  * therefore "live buckets × arrivals within one maxLen+lateness
  * window", never corpus-bound. The timeout is clamped to
  * `watermark + 1` (the r11 watermark-jump crash class — same clamp
  * as [[StreamAsof]]/[[StreamNearDedup]]).
  */
object StreamInterval {

  /** side 0 = a, side 1 = b (ids must be unique within each side). */
  final case class IvIn(bucket: Long, id: Long, side: Int,
      start: Long, end: Long, event_time: java.sql.Timestamp)

  final case class IvPair(a_id: Long, b_id: Long, overlap_ns: Long)

  /** Per-bucket state: flat arrays per side (encoder-codegen-friendly,
    * the [[StreamAsof.Buf]] rationale — deliberately not private).
    */
  final case class Buf(aId: Array[Long], aS: Array[Long], aE: Array[Long],
      bId: Array[Long], bS: Array[Long], bE: Array[Long])

  private def step(bucket: Long, shift: Int, maxLenNs: Long,
      rows: Iterator[IvIn], state: GroupState[Buf]): Iterator[IvPair] = {
    val prev = state.getOption.getOrElse(Buf(Array.empty, Array.empty,
      Array.empty, Array.empty, Array.empty, Array.empty))
    val aBuf = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val bBuf = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (i <- prev.aId.indices) aBuf += ((prev.aId(i), prev.aS(i), prev.aE(i)))
    for (i <- prev.bId.indices) bBuf += ((prev.bId(i), prev.bS(i), prev.bE(i)))
    val out = collection.mutable.ArrayBuffer.empty[IvPair]
    // process arrivals sequentially: each new row matches everything
    // already buffered (state + earlier arrivals of this batch), then
    // joins the buffer — a same-batch pair is emitted exactly once,
    // by whichever row the iterator yields second
    rows.foreach { r =>
      val (mine, other) = if (r.side == 0) (aBuf, bBuf) else (bBuf, aBuf)
      other.foreach { case (oid, os, oe) =>
        val lo = math.max(r.start, os)
        if (r.start <= oe && os <= r.end && (lo >> shift) == bucket) {
          val ov = math.min(r.end, oe) - lo
          out += (if (r.side == 0) IvPair(r.id, oid, ov)
                  else IvPair(oid, r.id, ov))
        }
      }
      mine += ((r.id, r.start, r.end))
    }
    val wm = state.getCurrentWatermarkMs()
    // bucket horizon: no admissible future arrival (end > wm, length
    // <= maxLen) can cover this bucket once wm passes bucket_end+maxLen
    val deadMs = ((((bucket + 1L) << shift) - 1L + maxLenNs) / 1000000L) + 1L
    if (deadMs <= wm || (aBuf.isEmpty && bBuf.isEmpty)) state.remove()
    else {
      state.update(Buf(aBuf.map(_._1).toArray, aBuf.map(_._2).toArray,
        aBuf.map(_._3).toArray, bBuf.map(_._1).toArray,
        bBuf.map(_._2).toArray, bBuf.map(_._3).toArray))
      state.setTimeoutTimestamp(math.max(deadMs, wm + 1L))
    }
    out.iterator
  }

  /** Overlap pairs over a tagged (id, side, start, end, event_time)
    * stream; `event_time` must be the interval's END instant (ns
    * truncated to ms) — the state-lifetime analysis above depends on
    * it. Append mode; each overlapping pair emitted exactly once.
    */
  def overlapMatches(tagged: DataFrame, watermark: String,
      shift: Int = 44, maxBuckets: Int = 1024): Dataset[IvPair] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    val maxLenNs = maxBuckets.toLong << shift
    tagged.withWatermark("event_time", watermark)
      .withColumn("bucket", explode(IntervalJoin.bucketsOf(
        col("start"), col("end"), shift, maxBuckets)))
      .select(col("bucket"), col("id"), col("side"),
        col("start"), col("end"), col("event_time"))
      .as[IvIn]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, rows: Iterator[IvIn], state: GroupState[Buf]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else step(bucket, shift, maxLenNs, rows, state)
      }
  }
}
