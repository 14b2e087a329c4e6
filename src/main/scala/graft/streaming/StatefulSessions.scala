package graft.streaming

import graft.Engine
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with flatMapGroupsWithState — the
  * custom-state path of Structured Streaming (KeyValueGroupedDataset),
  * complementing EventStream's windowed aggregation.
  *
  * State per user: the open session (start, last-seen, count). An event
  * more than `gap` after last-seen closes the session and emits it. On
  * event-time timeout the open session is flushed. At 100 TB this state
  * lives in the state store, partitioned by user — no driver memory.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, ts_us: Long, value: Double,
      event_time: java.sql.Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  val GapUs: Long = 30L * 60 * 1000 * 1000 // 30 min

  def sessionize(user: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed last+gap with no new events: flush the session
      val s = state.get
      state.remove()
      return Iterator.single(SessionOut(user, s.start, s.last, s.n))
    }
    var open = state.getOption
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    for (e <- events.toSeq.sortBy(_.ts_us)) {
      open match {
        case Some(s) if e.ts_us - s.last > GapUs =>
          out += SessionOut(user, s.start, s.last, s.n)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case Some(s) =>
          open = Some(s.copy(last = math.max(s.last, e.ts_us), n = s.n + 1))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last / 1000 + GapUs / 1000)
    }
    out.iterator
  }

  /** Streaming pipeline: events dir -> per-user sessions (append mode). */
  def sessions(spark: SparkSession, dir: String): Dataset[SessionOut] = {
    Engine.configure(spark)
    import spark.implicits._
    val schema = Engine.table(spark, dir, "events").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .selectExpr("user_id", "ts div 1000 AS ts_us", "value")
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "1 hour")
      .select(col("user_id"), col("ts_us"), col("value"), col("event_time"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionize)
  }

  /** Batch reference implementation (same semantics, finite input, all
    * sessions closed) — the correctness oracle for the streaming path.
    */
  def sessionsBatch(spark: SparkSession, dir: String): DataFrame = {
    Engine.configure(spark)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    Engine.table(spark, dir, "events")
      .selectExpr("user_id", "ts div 1000 AS ts_us")
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > GapUs ||
          lag(col("ts_us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .drop("sess_id")
  }
}
