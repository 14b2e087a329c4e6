package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval-overlap join — match two relations of [start, end] spans on
  * `a.start <= b.end AND b.start <= a.end` (closed intervals): session
  * spans vs incident windows, audio segments vs transcript spans, ad
  * exposures vs conversions. The naive formulation is a pure theta
  * join — a cartesian product at scale (the same trap class as the
  * as-of join, [[AsofJoin]]).
  *
  * Scalable formulation: quantize the timeline into fixed 2^shift-ns
  * buckets, explode every interval to the buckets it covers, equi-join
  * on the bucket (an ordinary shuffled hash join), and re-check the
  * exact overlap predicate. Each overlapping pair would match in every
  * shared bucket, so a pair is OWNED by exactly one bucket — the one
  * containing `greatest(a.start, b.start)` (that instant lies in both
  * intervals, hence in both sides' bucket ranges) — and the ownership
  * filter makes the join duplicate-free WITHOUT a distinct. Cost: one
  * equi-join whose fan-out is (interval length / bucket width) per
  * row; pick the bucket width near the p95 interval length so the
  * fan-out is a small constant. This is the Databricks/BigQuery range
  * join optimization re-expressed as a plain Spark plan.
  *
  * Intervals wider than `maxBuckets` buckets fail LOUDLY (raise_error,
  * the [[ZOrder]] guard precedent): one degenerate 30-day interval in
  * a 100 TB table would otherwise silently explode to millions of join
  * rows. Inverted intervals (start > end) are rejected the same way —
  * Spark's `sequence` would happily count backwards.
  */
object IntervalJoin {

  /** Package-visible so [[graft.streaming.StreamInterval]] buckets
    * with the EXACT batch expression (the StreamNearDedup precedent).
    */
  private[graft] def bucketsOf(s: Column, e: Column, shift: Int,
      maxBuckets: Int): Column = {
    val seq = sequence(shiftright(s, shift), shiftright(e, shift))
    when(s > e,
      raise_error(concat(lit("overlapJoin: inverted interval ["),
        s.cast("string"), lit(", "), e.cast("string"), lit("]")))
        .cast("array<bigint>"))
      .when(size(seq) > maxBuckets,
        raise_error(concat(lit("overlapJoin: interval ["), s.cast("string"),
          lit(", "), e.cast("string"),
          lit(s"] covers more than $maxBuckets buckets at shift=$shift — " +
            "widen the bucket or split the interval")))
          .cast("array<bigint>"))
      .otherwise(seq)
  }

  /** Inner overlap join of closed intervals. `a`/`b` column sets must
    * be disjoint; all columns of both sides ride through. Timestamps
    * are int64 (epoch-nanos here, but any monotone integer works);
    * bucket width is 2^shift units.
    */
  def overlapJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      shift: Int = 44, maxBuckets: Int = 1024): DataFrame = {
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "overlapJoin: column names must be disjoint between sides")
    val ab = a.withColumn("__bka",
      explode(bucketsOf(col(aStart), col(aEnd), shift, maxBuckets)))
    val bb = b.withColumn("__bkb",
      explode(bucketsOf(col(bStart), col(bEnd), shift, maxBuckets)))
    ab.join(bb,
        col("__bka") === col("__bkb") &&
          col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
          col("__bka") ===
            shiftright(greatest(col(aStart), col(bStart)), shift))
      .drop("__bka", "__bkb")
  }

  /** Driver entry + FULL oracle: per-user daily activity spans
    * ([min ts, max ts] per user-day) overlap-joined against incident
    * windows (±10 min around high-value error events), aggregated per
    * incident: how many user-sessions were exposed and for how long.
    * DuckDB computes it as the textbook quadratic theta join the
    * bucketed plan must equal; timestamps are µs-aligned (NOTES rule
    * 2). Integer day via `div`; overlap durations are exact int64
    * sums.
    */
  val intervalEntry: Q = Q("join_interval",
    (s, d) => {
      Engine.configure(s)
      val ev = Engine.table(s, d, "events")
        .select(col("event_id"), col("user_id"),
          (col("ts") - col("ts") % 1000).as("tsn"),
          col("event_type"), col("value"))
      val spans = ev.groupBy(col("user_id"),
          expr("tsn div 86400000000000").as("day"))
        .agg(min(col("tsn")).as("a_s"), max(col("tsn")).as("a_e"))
      val incidents = ev
        .filter(col("event_type") === "error" && col("value") >= 200.0)
        .select(col("event_id").as("incident_id"),
          (col("tsn") - lit(600000000000L)).as("b_s"),
          (col("tsn") + lit(600000000000L)).as("b_e"))
      overlapJoin(spans, incidents, "a_s", "a_e", "b_s", "b_e")
        .groupBy(col("incident_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s"))).as("total_overlap_ns"))
        .orderBy(col("incident_id"))
    },
    Some("""WITH ev AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS tsn, event_type, value
      |  FROM events),
      |a AS (
      |  SELECT user_id, tsn // 86400000000000 AS day,
      |    MIN(tsn) AS a_s, MAX(tsn) AS a_e
      |  FROM ev GROUP BY 1, 2),
      |b AS (
      |  SELECT event_id AS incident_id,
      |    tsn - 600000000000 AS b_s, tsn + 600000000000 AS b_e
      |  FROM ev WHERE event_type = 'error' AND value >= 200.0)
      |SELECT incident_id, COUNT(*) AS n_spans,
      |  CAST(SUM(LEAST(a_e, b_e) - GREATEST(a_s, b_s)) AS BIGINT)
      |    AS total_overlap_ns
      |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
      |GROUP BY incident_id
      |ORDER BY incident_id""".stripMargin))

  val defs: Seq[Q] = Seq(intervalEntry)
}
