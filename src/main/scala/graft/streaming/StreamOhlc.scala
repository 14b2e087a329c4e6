package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DAILY OHLC BARS — the incremental twin of
  * [[graft.operators.StatOps.ohlcEntry]] (tenth streaming twin;
  * SURVEY.md section 2.8): value events arrive tagged with their day
  * and the operator emits each day's finished bar
  * (day, n, open, high, low, close, sum_value) EXACTLY ONCE, when the
  * watermark completes the day — the timeseries-rollup artifact a
  * monitoring pipeline stores instead of raw points, produced at the
  * moment the day closes instead of by a nightly batch.
  *
  * State is keyed BY DAY: one flat accumulator per in-flight day
  * (n, cents sum, open/close champion (tsn, event_id, value), high,
  * low) — state rows = days concurrently open under the lateness
  * window, NEVER history (emitted days are removed). All reductions
  * are order-free: min/max champions under the TOTAL order
  * (tsn, event_id) and integer sums, so any micro-batch split and any
  * arrival order fold to the same bar (the spec quantifies over
  * both).
  *
  * Batch equality is EXACT, including the double sum: the batch
  * entry's sum_value is the Det DECIMAL(18,2) sum cast to double; the
  * twin converts each value to integer CENTS with the SAME
  * DECIMAL(18,2) cast (identical rounding), sums exactly in int64,
  * and divides once by 100.0 — the same correctly-rounded conversion
  * of the same exact rational. Cents headroom: |value| < 2^43 cents
  * leaves 2^20 rows per day before int64 could wrap; at bigger scale
  * swap the accumulator to two longs (the KMV split-sum pattern).
  *
  * Input contract (the [[StreamQuantiles.mergedCells]] one):
  * `event_time` lies INSIDE the row's `day`, so once the watermark
  * passes the day's end every admissible future row targets a LATER
  * day — emission on day completion is final, no retro-shift case
  * exists (unlike the funnel twin, day membership of a row never
  * depends on other rows).
  *
  * Timeout discipline: wake at (day+1)·day_ms − 1 (event-time
  * timeouts fire on STRICT watermark passage — the asof −1 lesson),
  * clamped to wm + 1 (the shared watermark-jump clamp).
  */
object StreamOhlc {

  private val DayMs = 86400000L

  final case class OIn(day: Long, tsn: Long, event_id: Long,
      cents: Long, value: Double, event_time: java.sql.Timestamp)

  /** One finished daily bar — the batch entry's row. */
  final case class Bar(day: Long, n: Long, open: Double, high: Double,
      low: Double, close: Double, sum_value: Double)

  /** Per-day accumulator. Not private — the state encoder's generated
    * code must reach it (the [[StreamAsof.Buf]] rationale).
    */
  final case class Buf(n: Long, sumCents: Long,
      openTsn: Long, openEid: Long, openVal: Double,
      closeTsn: Long, closeEid: Long, closeVal: Double,
      high: Double, low: Double)

  private def step(day: Long, rows: Iterator[OIn],
      state: GroupState[Buf]): Iterator[Bar] = {
    var b = state.getOption.orNull
    rows.foreach { r =>
      if (b == null)
        b = Buf(1L, r.cents, r.tsn, r.event_id, r.value,
          r.tsn, r.event_id, r.value, r.value, r.value)
      else {
        val openBeats = r.tsn < b.openTsn ||
          (r.tsn == b.openTsn && r.event_id < b.openEid)
        val closeBeats = r.tsn > b.closeTsn ||
          (r.tsn == b.closeTsn && r.event_id > b.closeEid)
        b = Buf(b.n + 1L, b.sumCents + r.cents,
          if (openBeats) r.tsn else b.openTsn,
          if (openBeats) r.event_id else b.openEid,
          if (openBeats) r.value else b.openVal,
          if (closeBeats) r.tsn else b.closeTsn,
          if (closeBeats) r.event_id else b.closeEid,
          if (closeBeats) r.value else b.closeVal,
          math.max(b.high, r.value), math.min(b.low, r.value))
      }
    }
    if (b == null) return Iterator.empty // timeout raced an empty key
    val wm = state.getCurrentWatermarkMs()
    // day complete once wm >= its exclusive end: every admissible
    // future row (event_time >= wm) then lies in a later day by the
    // input contract, so the bar can never change again
    if (wm >= (day + 1L) * DayMs) {
      state.remove()
      Iterator.single(Bar(day, b.n, b.openVal, b.high, b.low,
        b.closeVal, b.sumCents / 100.0))
    } else {
      state.update(b)
      state.setTimeoutTimestamp(
        math.max((day + 1L) * DayMs - 1L, wm + 1L))
      Iterator.empty
    }
  }

  /** Finished daily bars over a (day: long, tsn: long,
    * event_id: long, value: double, event_time: timestamp) stream.
    * Append mode; each day's bar is emitted exactly once, when the
    * watermark completes the day.
    */
  def dailyBars(tagged: DataFrame, watermark: String): Dataset[Bar] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.withWatermark("event_time", watermark)
      .select(col("day"), col("tsn"), col("event_id"),
        // the batch Det cast, row-for-row: DECIMAL(18,2) rounding
        // BEFORE the cents scale-up, so the two paths round ties
        // identically
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"),
        col("value"), col("event_time"))
      .as[OIn]
      .groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (d: Long, rows: Iterator[OIn], state: GroupState[Buf]) =>
          if (state.hasTimedOut) step(d, Iterator.empty, state)
          else step(d, rows, state)
      }
  }
}
