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

  /** Memory design: a micro-batch group arrives in arbitrary ts order
    * (Spark's UnsupportedOperationChecker forbids even sortWithinPartitions
    * upstream of a stateful operator, so pre-sorted input is not
    * expressible), and sessionization needs ts order — but it only needs
    * the TIMESTAMPS. So the group is consumed into a primitive long array
    * (8 B/event: a 100k-event skewed user costs ~800 KB, vs a boxed
    * `toSeq` of case classes at ~50x that), sorted in place, and the
    * session outputs are emitted lazily from it. State writes happen in a
    * lazy tail so they run after the last event is consumed.
    */
  def sessionize(user: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed last+gap with no new events: flush the session
      val s = state.get
      state.remove()
      return Iterator.single(SessionOut(user, s.start, s.last, s.n))
    }
    val b = new scala.collection.mutable.ArrayBuilder.ofLong
    events.foreach(e => b += e.ts_us)
    val ts = b.result()
    java.util.Arrays.sort(ts)
    var open = state.getOption
    val closed = ts.iterator.flatMap { t =>
      open match {
        case Some(s) if t - s.last > GapUs =>
          open = Some(OpenSession(t, t, 1))
          Iterator.single(SessionOut(user, s.start, s.last, s.n))
        case Some(s) =>
          open = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
          Iterator.empty
        case None =>
          open = Some(OpenSession(t, t, 1))
          Iterator.empty
      }
    }
    // `++`'s by-name argument evaluates only after `closed` is exhausted:
    // the state update sees the final open session.
    closed ++ {
      open.foreach { s =>
        state.update(s)
        // clamped to the CURRENT watermark: rows are admitted against
        // the PREVIOUS batch's watermark but the timeout is validated
        // against the current (eviction) one, so when the watermark
        // jumps more than the gap in one batch a marginally-late event
        // would otherwise set a timeout at/below the watermark and
        // GroupStateImpl kills the query (same bug class as
        // StreamNearDedup's horizon — StatefulSessionsSpec pins the
        // jump case). The +1 keeps it strictly ahead; the flush then
        // fires on the next watermark advance, as early as permitted.
        state.setTimeoutTimestamp(math.max(s.last / 1000 + GapUs / 1000,
          state.getCurrentWatermarkMs() + 1))
      }
      Iterator.empty
    }
  }

  /** Streaming pipeline: events dir -> per-user sessions (append mode).
    *
    * Group input arrives UNSORTED (see sessionize's doc: local sorts
    * upstream of stateful ops are rejected by Spark's
    * UnsupportedOperationChecker, so pre-sorted group input is not
    * expressible); sessionize handles ordering itself with an in-place
    * primitive long-array sort of just the timestamps. The stateful
    * operator's own user_id shuffle is the only exchange in the plan.
    */
  def sessions(spark: SparkSession, dir: String): Dataset[SessionOut] = {
    Engine.configure(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val evs = Engine.normalizeEventTs(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
      .selectExpr("user_id", "ts div 1000 AS ts_us", "value")
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    pipeline(evs)
  }

  /** The sessionization transform over any (user_id, ts_us, value,
    * event_time) stream — shared by the parquet path and tests.
    * `groupBy(col).as[K, V]` (not `groupByKey`) keeps the grouping key
    * the real user_id column, so the stateful operator's shuffle is the
    * only exchange in the plan.
    */
  def pipeline(evs: DataFrame): Dataset[SessionOut] = {
    val spark = evs.sparkSession
    import spark.implicits._
    evs
      .withWatermark("event_time", "1 hour")
      .select(col("user_id"), col("ts_us"), col("value"), col("event_time"))
      .as[Ev]
      .groupBy(col("user_id")).as[Long, Ev]
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
