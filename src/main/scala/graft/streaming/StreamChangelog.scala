package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming changelog resolution — the incremental twin of
  * [[graft.operators.ChangeOps.applyChangelog]]'s window (the CDC
  * shape: a snapshot plus a LIVE stream of upserts/deletes).
  * `mapGroupsWithState` keyed by the row key holds exactly ONE
  * resolved operation per key — the running last-writer-wins with the
  * batch path's exact tie order (seq desc, then op desc) — and each
  * micro-batch re-emits the keys it touched with their current
  * winner. The LAST emission per key equals the batch window's
  * winner for ANY micro-batch split (StreamChangelogSpec pins it),
  * so downstream the same anti-join + union produces the same next
  * snapshot. State = one row per DISTINCT key ever touched — the
  * changelog working set, not its volume.
  */
object StreamChangelog {

  final case class LogRow(key: Long, seq: Long, op: String,
      payload: String)

  private def resolve(key: Long, rows: Iterator[LogRow],
      state: GroupState[LogRow]): LogRow = {
    val best = (state.getOption.iterator ++ rows)
      .maxBy(r => (r.seq, r.op))
    state.update(best)
    best
  }

  /** Running resolved operation per key over a streaming changelog
    * (columns key, seq, op, payload). Update-mode output.
    */
  def resolved(log: DataFrame): Dataset[LogRow] = {
    val spark = log.sparkSession
    import spark.implicits._
    log.as[LogRow]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(resolve)
  }
}
