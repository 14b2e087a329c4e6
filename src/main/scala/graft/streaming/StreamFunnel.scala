package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ORDERED FUNNEL — the incremental twin of
  * [[graft.operators.FunnelOps.funnelStages]] (ninth streaming twin;
  * SURVEY.md section 2.8): per-user conversion events are emitted AS
  * USERS CONVERT — one row per (user, stage) the first time the user
  * completes that stage, with the same strict event-time chain and
  * per-step conversion-window cap as the batch funnel. The batch
  * entry's per-stage relations are exactly the union of these rows,
  * which is what the spec pins (set equality under arbitrary
  * micro-batch splits and arrival orders).
  *
  * Exactness under out-of-order arrival: a user's stage-i time is
  * "first event of type i after t_{i-1}", so a late earlier event
  * could retro-shift the whole chain — the twin therefore folds an
  * event into the chain only once its millisecond is STRICTLY below
  * the watermark (Spark admits microsecond event times down to the
  * ms watermark itself, so ms == wm is not yet final), buffering
  * in-flight events per user. Non-advancing FINALIZED events are
  * dropped, provably safely: every admissible future event's ms is
  * >= wm > every finalized ms, so any FUTURE transition's t_prev
  * exceeds every finalized tsn — a dropped event could never satisfy
  * `tsn > t_prev` later.
  *
  * State per user: (reached stage, t_prev) + the in-flight buffer —
  * users-sized overall (the [[StreamAsof]] bound class), with the
  * buffer bounded by one lateness window. Completed users keep their
  * 2-long chain state (dropping it would re-emit stage 1 on their
  * next event).
  *
  * Timeout discipline: wake at (min pending ms) − 1 clamped to
  * wm + 1 (the shared asof −1 / watermark-jump clamp).
  */
object StreamFunnel {

  final case class FIn(user: Long, stage: Int, tsn: Long,
      event_time: java.sql.Timestamp)

  /** One conversion: `stage` is 1-based, `t` the stage's event-time
    * ns, `lag_ns` 0 for stage 1 else t − t_prev.
    */
  final case class FOut(user_id: Long, stage: Int, t: Long,
      lag_ns: Long)

  /** Per-user state. Not `private` — the state encoder's generated
    * code must reach it (the [[StreamAsof.Buf]] rationale).
    */
  final case class Buf(reached: Int, tPrev: Long,
      pStage: Array[Int], pTsn: Array[Long], pMs: Array[Long])

  private def step(user: Long, rows: Iterator[FIn],
      state: GroupState[Buf], maxLagNs: Long): Iterator[FOut] = {
    val prev = state.getOption
      .getOrElse(Buf(0, 0L, Array.empty, Array.empty, Array.empty))
    val arrived = rows.toList
    val all = prev.pStage.indices
      .map(i => (prev.pStage(i), prev.pTsn(i), prev.pMs(i))) ++
      arrived.map(r => (r.stage, r.tsn, r.event_time.getTime))
    val wm = state.getCurrentWatermarkMs()
    // finalize STRICTLY below the watermark millisecond: Spark's late
    // filter compares microsecond event times against the ms
    // watermark, so an event in ms == wm is still admissible — if two
    // same-ms events straddle micro-batches, folding the first at
    // ms == wm would fix the chain before the (possibly smaller-tsn)
    // second arrives. With ms < wm, every admissible future event has
    // ms >= wm > every finalized ms, restoring the disjointness proof.
    val (due, pending) = all.partition(_._3 < wm)
    var reached = prev.reached
    var tPrev = prev.tPrev
    val out = collection.mutable.ArrayBuffer.empty[FOut]
    // chain fold in event-time order; tie order is immaterial (a
    // same-tsn next-stage event fails the strict tsn > tPrev check
    // whichever side of the tie processes first)
    due.sortBy(e => (e._2, e._1)).foreach { case (st, tsn, _) =>
      if (st == reached + 1 &&
          (reached == 0 || (tsn > tPrev && tsn - tPrev <= maxLagNs))) {
        out += FOut(user, st, tsn, if (reached == 0) 0L else tsn - tPrev)
        reached = st
        tPrev = tsn
      }
    }
    // an untouched chain with nothing buffered is information-free:
    // the getOption default reconstructs it exactly, so drop the row
    // (users whose only funnel events were non-first stages would
    // otherwise hold state forever)
    if (reached == 0 && pending.isEmpty) state.remove()
    else {
      state.update(Buf(reached, tPrev, pending.map(_._1).toArray,
        pending.map(_._2).toArray, pending.map(_._3).toArray))
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(pending.map(_._3).min - 1L, wm + 1L))
    }
    out.iterator
  }

  /** Conversion rows over a (user_id, event_type, tsn, event_time)
    * stream. Append mode; each (user, stage) is emitted exactly
    * once, when the watermark finalizes the stage's event.
    */
  def conversions(events: DataFrame, stages: Seq[String],
      maxLagNs: Long, watermark: String): Dataset[FOut] = {
    require(stages.size >= 2, "conversions: need >= 2 stages")
    require(stages.distinct.size == stages.size,
      "conversions: repeated stage types are ambiguous")
    require(maxLagNs > 0, "conversions: maxLagNs > 0")
    val spark = events.sparkSession
    import spark.implicits._
    val tagged = events
      .withColumn("stage",
        array_position(typedlit(stages), col("event_type")).cast("int"))
      .filter(col("stage") > 0)
      .select(col("user_id").as("user"), col("stage"), col("tsn"),
        col("event_time"))
    tagged.withWatermark("event_time", watermark)
      .as[FIn]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (u: Long, rows: Iterator[FIn], state: GroupState[Buf]) =>
          if (state.hasTimedOut) step(u, Iterator.empty, state, maxLagNs)
          else step(u, rows, state, maxLagNs)
      }
  }
}
