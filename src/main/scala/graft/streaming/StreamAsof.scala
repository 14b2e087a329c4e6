package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF JOIN — the incremental twin of
  * [[graft.operators.AsofJoin.asofJoin]] (engine surface beyond
  * parity; SURVEY.md section 2.8): a left event stream is enriched
  * with the most recent right event at-or-before it per key, with
  * EXACT event-time semantics under out-of-order arrival.
  *
  * Both sides arrive as ONE tagged stream (union upstream, the same
  * relation shape the batch operator builds internally). Per key,
  * `flatMapGroupsWithState` buffers BOTH sides and only emits a left
  * row once the watermark has passed its event time — at that point
  * no admissible right row at-or-before it can still arrive, so the
  * match is final. Equal timestamps: the right row is eligible
  * (at-or-before is inclusive) and the largest tie id wins — exactly
  * the batch tiebreak, which is what makes the batch-equivalence pin
  * (StreamAsofSpec) an EQUALITY, not an approximation.
  *
  * State bound per key: left rows live only until the watermark
  * reaches their event time (the in-flight lateness window); right
  * rows are pruned to those still matchable — everything newer than
  * the watermark plus the SINGLE latest row at-or-before it (any
  * older right row is dominated for every possible future left).
  * That is O(events within one watermark window) per key, not
  * history-deep.
  *
  * Timeout discipline: the wake-up timestamp is clamped to
  * `getCurrentWatermarkMs + 1` — Spark validates timeouts against the
  * EVICTION watermark while admitting rows against the previous one
  * (the r11 watermark-jump crash class, see NOTES; same clamp as
  * [[StreamNearDedup]] and [[StatefulSessions]]).
  */
object StreamAsof {

  /** side 0 = right (enriching), side 1 = left (probing). */
  final case class AsofIn(key: Long, id: Long, side: Int,
      event_time: java.sql.Timestamp)

  final case class AsofHit(left_id: Long, key: Long,
      right_id: Option[Long], lag_ms: Option[Long])

  /** Per-key state: flat (ts, id) pair arrays. Engine-internal, but
    * deliberately NOT `private` — the state encoder's generated code
    * must reach the accessors (a private class fails Janino
    * compilation at runtime), and nested tuple collections trip
    * encoder codegen where plain long arrays do not.
    */
  final case class Buf(leftTs: Array[Long], leftId: Array[Long],
      rightTs: Array[Long], rightId: Array[Long])

  private def step(key: Long, rows: Iterator[AsofIn],
      state: GroupState[Buf]): Iterator[AsofHit] = {
    val prev = state.getOption
      .getOrElse(Buf(Array.empty, Array.empty, Array.empty, Array.empty))
    val arrived = rows.toList
    val lefts = prev.leftTs.zip(prev.leftId) ++ arrived
      .filter(_.side == 1).map(r => (r.event_time.getTime, r.id))
    val rights = prev.rightTs.zip(prev.rightId) ++ arrived
      .filter(_.side == 0).map(r => (r.event_time.getTime, r.id))
    val wm = state.getCurrentWatermarkMs()
    val (due, pending) = lefts.partition(_._1 <= wm)
    val out = due.sortBy(identity).map { case (lt, lid) =>
      val hs = rights.filter(_._1 <= lt)
      // (ts, id): latest ts, largest tie id
      val m = if (hs.isEmpty) None else Some(hs.max)
      AsofHit(lid, key, m.map(_._2), m.map(lt - _._1))
    }
    // prune rights: keep all still-matchable rows — newer than the
    // watermark, plus the single dominant one at-or-before it
    val (future, past) = rights.partition(_._1 > wm)
    val keepRights =
      ((if (past.isEmpty) Array.empty[(Long, Long)] else Array(past.max)) ++
        future).distinct
    if (pending.isEmpty && keepRights.isEmpty) state.remove()
    else {
      state.update(Buf(pending.map(_._1).toArray, pending.map(_._2).toArray,
        keepRights.map(_._1), keepRights.map(_._2)))
      // wake when the earliest pending left becomes emittable. An
      // event-time timeout registered at ts fires once the watermark
      // STRICTLY exceeds ts, while draining uses ts <= wm — so
      // register event_time - 1, not event_time, or a left whose
      // event time exactly equals the final watermark value is never
      // flushed (r11 ADVICE liveness gap). Pending lefts satisfy
      // ts > wm, so min - 1 >= wm; the clamp to wm + 1 (Spark
      // validates timeouts strictly above the eviction watermark —
      // the r11 watermark-jump crash class) only binds when
      // min == wm + 1, the one boundary where Spark's API cannot
      // express "fire at wm == ts" and strict passage is required.
      // For a rights-only buffer, age it out one day past the frontier.
      val base = if (pending.nonEmpty) pending.map(_._1).min - 1L
        else wm + 86400000L
      state.setTimeoutTimestamp(math.max(base, wm + 1L))
    }
    out.iterator
  }

  /** As-of matches over a tagged (key, id, side, event_time) stream.
    * Append mode; every left row is emitted exactly once, when the
    * watermark passes its event time.
    */
  def asofMatches(tagged: DataFrame, watermark: String): Dataset[AsofHit] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.withWatermark("event_time", watermark)
      .select(col("key"), col("id"), col("side"), col("event_time"))
      .as[AsofIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[AsofIn], state: GroupState[Buf]) =>
          if (state.hasTimedOut) {
            // no new rows: drain whatever the advanced watermark allows
            step(key, Iterator.empty, state)
          } else step(key, rows, state)
      }
  }
}
