package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ROLLING-QUANTILE HISTOGRAMS — the incremental twin of
  * [[graft.operators.StatOps.rollingQuantilesEntry]] (sixth streaming
  * twin; SURVEY.md section 2.8): value events arrive bucketed
  * (day, bucket), and for every COMPLETED day the operator emits the
  * 7-day-merged histogram cell (day, bucket, merged_count) — the
  * mergeable-summary artifact the batch entry derives, from which
  * p50/p90/p99 per day follow by a stateless cumulative pass.
  *
  * State is keyed BY BUCKET (≤ 256 keys): each key holds per-day
  * counts for the days still inside some unfinished 7-day window.
  * A day d is emitted once the watermark passes its end (all day-d
  * data admitted; days d-6..d already in state), and counts for days
  * ≤ emitted-6 are pruned — state per key is ~7 days + in-flight,
  * never history. Input contract: `event_time` must lie INSIDE the
  * row's `day` (day·86400000 ≤ event_time_ms < (day+1)·86400000), so
  * an admitted row can never target an already-emitted day.
  *
  * Emission is exact, not approximate-by-arrival: the emitted cell is
  * the same integer sum the batch RANGE window computes, so the spec
  * pins SET equality with the batch `merged` relation (mc > 0 cells)
  * under arbitrary micro-batch splits. Trailing-window days past a
  * bucket's last datum (mc > 0 from the 6-day tail) are emitted too —
  * the continuous-time semantic the batch day-spine clips at the
  * corpus's last day.
  *
  * Timeout discipline: wake at (emitted+2)·day − 1 (event-time
  * timeouts fire on STRICT watermark passage — the asof −1 lesson),
  * clamped to wm+1 (the watermark-jump crash clamp shared by all
  * twins).
  */
object StreamQuantiles {

  private val DayMs = 86400000L

  final case class QIn(b: Int, day: Long, event_time: java.sql.Timestamp)

  final case class QCell(day: Long, b: Int, mc: Long)

  /** Per-bucket state: per-day counts + the last emitted day. Not
    * private — the state encoder's generated code must reach it
    * (the [[StreamAsof.Buf]] rationale).
    */
  final case class Buf(days: Array[Long], counts: Array[Long],
      emitted: Long)

  private def step(bucket: Int, rows: Iterator[QIn],
      state: GroupState[Buf], window: Int): Iterator[QCell] = {
    val prev = state.getOption
    val m = collection.mutable.Map.empty[Long, Long]
    prev.foreach(p =>
      p.days.indices.foreach(i => m(p.days(i)) = p.counts(i)))
    rows.foreach(r => m(r.day) = m.getOrElse(r.day, 0L) + 1L)
    if (m.isEmpty) { state.remove(); return Iterator.empty }
    val wm = state.getCurrentWatermarkMs()
    // day d is complete once wm >= (d+1)*DayMs
    val lastComplete = wm / DayMs - 1L
    // "nothing emitted yet" sentinel, NOT first-batch min - 1: with a
    // lateness window, rows for earlier days may arrive in LATER
    // batches (they are admitted whenever event_time >= wm), and an
    // emitted-watermark initialized from the first batch would skip
    // them silently. Days actually emitted are always < (wm+DayMs)/
    // DayMs at emission time, and admitted rows have event_time >=
    // wm, so no admitted row can ever target a day <= emitted once
    // emitted is REAL — only the initialization needed fixing.
    val NoneYet = Long.MinValue / 4L
    var emitted = prev.map(_.emitted).getOrElse(NoneYet)
    val maxDay = m.keys.max
    val out = collection.mutable.ArrayBuffer.empty[QCell]
    var d = math.max(emitted + 1L, m.keys.min) // below min: mc = 0
    val hi = math.min(lastComplete, maxDay + window - 1L) // beyond: mc = 0
    while (d <= hi) {
      val mc = (d - window + 1L to d)
        .foldLeft(0L)((a, k) => a + m.getOrElse(k, 0L))
      if (mc > 0L) out += QCell(d, bucket, mc)
      d += 1L
    }
    if (lastComplete > emitted) emitted = lastComplete
    // day emitted+1 still needs days >= emitted+1 - (window-1)
    val keep = m.filter(_._1 >= emitted - (window - 2L))
    if (keep.isEmpty) state.remove()
    else {
      val ks = keep.keys.toArray.sorted
      state.update(Buf(ks, ks.map(keep), emitted))
      state.setTimeoutTimestamp(
        math.max((emitted + 2L) * DayMs - 1L, wm + 1L))
    }
    out.iterator
  }

  /** Merged `window`-day histogram cells over a (b: int, day: long,
    * event_time: timestamp) stream. Append mode; each (day, bucket)
    * cell with a positive merged count is emitted exactly once, when
    * the watermark completes the day. `window` = 7 is the rolling-
    * quantile feed; `window` = 1 degenerates to exactly-once DAILY
    * histogram cells (the [[StreamDrift]] feed) with per-key state
    * pruned to in-flight days only.
    */
  def mergedCells(tagged: DataFrame, watermark: String,
      window: Int = 7): Dataset[QCell] = {
    require(window >= 1, "mergedCells: window >= 1")
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.withWatermark("event_time", watermark)
      .select(col("b"), col("day"), col("event_time"))
      .as[QIn]
      .groupByKey(_.b)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (b: Int, rows: Iterator[QIn], state: GroupState[Buf]) =>
          if (state.hasTimedOut) step(b, Iterator.empty, state, window)
          else step(b, rows, state, window)
      }
  }
}
