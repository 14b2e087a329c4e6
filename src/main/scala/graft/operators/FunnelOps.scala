package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral event analytics — ordered-funnel and cohort-retention,
  * the two queries every product-events warehouse runs daily and the
  * reference's SQL surface can only express with painful self-join
  * pyramids. Both are exact integer computations over the events
  * table, fully DuckDB-oracle-checked.
  *
  * 100 TB shapes:
  *  - Funnel: one filtered aggregate per stage, each a shuffle on
  *    user_id that AQE plans off the same exchange family; stage k+1
  *    joins stage k's (user, t_k) — a users-sized relation, not
  *    events-sized. No per-user arrays, no sorting of the corpus, so
  *    per-user event counts can be unbounded. With a type-partitioned
  *    events table the three stage scans become partition-pruned.
  *  - Retention: distinct (user, day) first (the activity matrix is
  *    the SMALL relation — users x active-days), cohort = min day per
  *    user via one more aggregate on the same key, then a tiny
  *    (cohort, offset) count. Raw events are touched once.
  *
  * Determinism: day keys are µs-aligned epoch-ns div (NOTES rule 2);
  * all outputs are int64 counts and ns sums — no doubles anywhere.
  */
object FunnelOps {

  private val DayNs = 86400000000000L

  /** Lag cap that never binds (event-time diffs are < 2^62). */
  val Uncapped: Long = Long.MaxValue - 1

  /** Driver entry + FULL oracle: the view -> click -> purchase ordered
    * funnel. Per user: t1 = first view, t2 = first click AFTER t1,
    * t3 = first purchase AFTER t2 (strict event-time order — the
    * "did the user progress" semantic, not mere co-occurrence).
    * Output: one row per stage with the user count that reached it
    * and the exact total ns lag from the previous stage.
    */
  val funnelEntry: Q = Q("events_funnel",
    (s, d) => {
      Engine.configure(s)
      val ev = Engine.table(s, d, "events")
        .select(col("user_id"), col("event_type"),
          (col("ts") - col("ts") % 1000).as("tsn"))
      // ONE funnel implementation (r14): the uncapped 3-stage entry is
      // funnelK with the lag cap effectively off — the oracle below is
      // unchanged and FunnelOpsSpec pins the chain against a
      // sequential per-user recompute
      funnelK(ev, Seq("view", "click", "purchase"), Uncapped)
    },
    Some("""WITH ev AS (
      |  SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
      |v AS (
      |  SELECT user_id, MIN(tsn) AS t1 FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, v.t1, MIN(e.tsn) AS t2
      |  FROM ev e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.tsn > v.t1
      |  GROUP BY e.user_id, v.t1),
      |p AS (
      |  SELECT e.user_id, c.t2, MIN(e.tsn) AS t3
      |  FROM ev e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.tsn > c.t2
      |  GROUP BY e.user_id, c.t2)
      |SELECT 1 AS stage, 'view' AS event_type,
      |  CAST(COUNT(*) AS BIGINT) AS users,
      |  CAST(0 AS BIGINT) AS total_lag_ns FROM v
      |UNION ALL
      |SELECT 2, 'click', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM c
      |UNION ALL
      |SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM p
      |ORDER BY stage""".stripMargin))

  /** Driver entry + FULL oracle: cohort retention — users grouped by
    * their FIRST active day, counted on each later active day they
    * return (offsets 0..13). The (cohort_day, offset) matrix is the
    * product-analytics retention curve.
    */
  val retentionEntry: Q = Q("events_retention",
    (s, d) => {
      Engine.configure(s)
      val act = Engine.table(s, d, "events")
        .select(col("user_id"),
          expr(s"(ts - ts % 1000) div ${DayNs}L").as("day"))
        .distinct()
      val cohort = act.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      act.join(cohort, "user_id")
        .select(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .filter(col("day_offset") <= 13)
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""WITH act AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
      |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM act a JOIN cohort c ON a.user_id = c.user_id
      |WHERE a.day - c.cohort_day <= 13
      |GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset""".stripMargin))

  /** Driver entry + FULL oracle: event-type transition matrix — for
    * each user's event-time-ordered stream, count consecutive
    * (from_type -> to_type) pairs. The first-order Markov statistic
    * behind "what do users do next" and sequence-mining feature
    * tables.
    *
    * 100 TB shape: ONE window (lead over user_id partitions — the
    * per-user shuffle every sequence operator needs) + one
    * small-keyed aggregate (|types|² rows). Ties on ts break by
    * event_id, so the sequence — and therefore every count — is
    * deterministic under any partitioning.
    */
  val transitionsEntry: Q = Q("events_transitions",
    (s, d) => {
      Engine.configure(s)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsn"), col("event_id"))
      Engine.table(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          (col("ts") - col("ts") % 1000).as("tsn"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tsn
      |  FROM events),
      |seq AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY tsn, event_id) AS to_type
      |  FROM ev)
      |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |FROM seq WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type
      |ORDER BY from_type, to_type""".stripMargin))

  /** Generalized ordered funnel: `stages` is ANY ordered list of
    * event types (k >= 2), `maxLagNs` caps the lag a user may take
    * between CONSECUTIVE stages (the conversion window; pass
    * `Long.MaxValue` for the uncapped semantic of [[funnelEntry]]).
    * Per user: t1 = first `stages(0)` event; t_{i+1} = first
    * `stages(i+1)` event with t_i < tsn <= t_i + maxLagNs. Output:
    * one row per stage — (stage, event_type, users, total_lag_ns).
    *
    * Same 100 TB shape as the fixed 3-stage entry, for any k: one
    * filtered aggregate per stage, each stage i+1 joining stage i's
    * users-sized (user, t_i) relation — never per-user event arrays,
    * so per-user event counts stay unbounded; k small-keyed
    * aggregates union into k rows.
    *
    * `ev` must carry (user_id, event_type, tsn: int64 ns).
    *
    * `checkpoint` is the stage-materialization hook (tests inject a
    * capture to pin the one-events-scan-per-stage budget).
    */
  def funnelK(ev: DataFrame, stages: Seq[String], maxLagNs: Long,
      checkpoint: DataFrame => DataFrame = Engine.materialize): DataFrame = {
    val sts = funnelStages(ev, stages, maxLagNs, checkpoint)
    var rows = sts.head.agg(count(lit(1)).as("users"),
      lit(0L).as("total_lag_ns"))
      .select(lit(1).as("stage"), lit(stages.head).as("event_type"),
        col("users"), col("total_lag_ns"))
    sts.zipWithIndex.drop(1).foreach { case (nxt, i) =>
      rows = rows.unionAll(nxt.agg(count(lit(1)).as("users"),
        coalesce(sum(col("t") - col("tp")), lit(0L)).as("total_lag_ns"))
        .select(lit(i + 1).as("stage"), lit(stages(i)).as("event_type"),
          col("users"), col("total_lag_ns")))
    }
    rows.orderBy(col("stage"))
  }

  /** The checkpointed per-stage relations behind [[funnelK]]: element
    * 0 is (user_id, t) for the first stage; element i >= 1 is
    * (user_id, tp, t) for stage i+1 (tp = the user's stage-i time).
    * Each relation is users-sized AND read twice (the next stage's
    * join + its consumer's aggregate) — checkpointed so the raw
    * events relation is scanned exactly ONCE per stage (audited:
    * uncheckpointed, the k=4 entry re-derived events 10x).
    */
  def funnelStages(ev: DataFrame, stages: Seq[String], maxLagNs: Long,
      checkpoint: DataFrame => DataFrame = Engine.materialize)
      : Seq[DataFrame] = {
    require(stages.size >= 2, "funnelK: need >= 2 stages")
    require(stages.distinct.size == stages.size,
      "funnelK: repeated stage types are ambiguous")
    require(maxLagNs > 0, "funnelK: maxLagNs > 0")
    def typed(t: String) = ev.filter(col("event_type") === t)
    val first = checkpoint(typed(stages.head).groupBy(col("user_id"))
      .agg(min(col("tsn")).as("t")))
    val out = Seq.newBuilder[DataFrame]
    out += first
    var reached = first // (user_id, t) — users-sized, never events-sized
    stages.drop(1).foreach { t =>
      val nxt = checkpoint(typed(t)
        .join(reached.select(col("user_id"), col("t").as("tp")), "user_id")
        .filter(col("tsn") > col("tp") &&
          col("tsn") - col("tp") <= maxLagNs)
        .groupBy(col("user_id"), col("tp"))
        .agg(min(col("tsn")).as("t")))
      out += nxt
      reached = nxt.select(col("user_id"), col("t"))
    }
    out.result()
  }

  /** EXACT inter-stage conversion-time percentiles — "how long does
    * each funnel step take", the analytics the lag SUM in [[funnelK]]
    * can't answer (means hide the tail). One output row per
    * (stage >= 2, p): the p-th percentile of (t_i − t_{i−1}) over the
    * stage's converting users, as the ceil(p·n/100)-th smallest lag
    * (the [[ExactQuantile]] rank convention — integer ns, exact, no
    * interpolation).
    *
    * 100 TB shape: the stage relations are the checkpointed
    * users-sized [[funnelStages]], unioned under a stage tag so ALL
    * stages share ONE bounds job and every histogram-refinement pass
    * ([[ExactQuantile.percentilesGrouped]] — 1 + rounds
    * driver-synchronized jobs total, vs stages × (2 + rounds) for
    * per-stage selections; measured 2.37 s -> the scheduling latency
    * of ~4 tiny jobs at sf0.1). No per-stage sort window — a funnel
    * stage is exactly the "single giant group" the grouped-window
    * percentile recipe documents as its own failure mode. Driver
    * state: ≤ 4096 longs per active (stage, range) + the k-1 result
    * rows.
    */
  def funnelLagQuantiles(ev: DataFrame, stages: Seq[String],
      maxLagNs: Long, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "funnelLagQuantiles: percentiles in 1..100")
    val spark = ev.sparkSession
    import spark.implicits._
    val sts = funnelStages(ev, stages, maxLagNs)
    // no-shuffle coalesce: the union of k checkpointed users-sized
    // relations carries k x 32 partitions, and every refinement round
    // scans it — narrowing to one round of tasks costs nothing and
    // cuts the per-round task storm k-fold (partition COUNT, not
    // size, is the driver of these tiny jobs' latency)
    val parts = ev.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val tagged = sts.zipWithIndex.drop(1).map { case (st, i) =>
      st.select(lit(i + 1).as("stage"),
        (col("t") - col("tp")).as("lag"))
    }.reduce(_ unionAll _).coalesce(parts)
    val byStage = ExactQuantile.percentilesGrouped(
      tagged, col("stage"), col("lag"), ps)
    val rows = byStage.toSeq.sortBy(_._1).flatMap { case (st, (n, pv)) =>
      ps.map(p => (st, stages(st - 1), n, p, pv(p)))
    }
    rows.toDF("stage", "event_type", "users", "p", "lag_ns")
      .orderBy(col("stage"), col("p"))
  }

  private val FunnelK4Lag = 2L * DayNs // 2-day conversion window

  /** Driver entry + FULL oracle: the 4-stage capped-window funnel
    * signup -> view -> click -> purchase via [[funnelK]], each
    * inter-stage lag capped at 2 days — the parameterized shape real
    * funnel queries take (r13 verdict #4). The 3-stage uncapped
    * [[funnelEntry]] is unchanged.
    */
  val funnelK4Entry: Q = Q("events_funnel_k4",
    (s, d) => {
      Engine.configure(s)
      val ev = Engine.table(s, d, "events")
        .select(col("user_id"), col("event_type"),
          (col("ts") - col("ts") % 1000).as("tsn"))
      funnelK(ev, Seq("signup", "view", "click", "purchase"),
        FunnelK4Lag)
    },
    Some(s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(tsn) AS t FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, s1.t AS tp, MIN(e.tsn) AS t
      |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'view' AND e.tsn > s1.t
      |    AND e.tsn - s1.t <= ${FunnelK4Lag}
      |  GROUP BY e.user_id, s1.t),
      |s3 AS (
      |  SELECT e.user_id, s2.t AS tp, MIN(e.tsn) AS t
      |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'click' AND e.tsn > s2.t
      |    AND e.tsn - s2.t <= ${FunnelK4Lag}
      |  GROUP BY e.user_id, s2.t),
      |s4 AS (
      |  SELECT e.user_id, s3.t AS tp, MIN(e.tsn) AS t
      |  FROM ev e JOIN s3 ON e.user_id = s3.user_id
      |  WHERE e.event_type = 'purchase' AND e.tsn > s3.t
      |    AND e.tsn - s3.t <= ${FunnelK4Lag}
      |  GROUP BY e.user_id, s3.t)
      |SELECT 1 AS stage, 'signup' AS event_type,
      |  CAST(COUNT(*) AS BIGINT) AS users,
      |  CAST(0 AS BIGINT) AS total_lag_ns FROM s1
      |UNION ALL
      |SELECT 2, 'view', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(t - tp), 0) AS BIGINT) FROM s2
      |UNION ALL
      |SELECT 3, 'click', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(t - tp), 0) AS BIGINT) FROM s3
      |UNION ALL
      |SELECT 4, 'purchase', CAST(COUNT(*) AS BIGINT),
      |  CAST(COALESCE(SUM(t - tp), 0) AS BIGINT) FROM s4
      |ORDER BY stage""".stripMargin))

  /** Driver entry + FULL oracle: exact p50/p90 time-to-convert per
    * stage of the 4-stage capped funnel (same stages and window as
    * [[funnelK4Entry]]) via [[funnelLagQuantiles]]. The oracle
    * recomputes each percentile as the literal ROW_NUMBER order
    * statistic over the per-stage lag sort this operator avoids.
    */
  val funnelLagsEntry: Q = Q("events_funnel_lags",
    (s, d) => {
      Engine.configure(s)
      val ev = Engine.table(s, d, "events")
        .select(col("user_id"), col("event_type"),
          (col("ts") - col("ts") % 1000).as("tsn"))
      funnelLagQuantiles(ev,
        Seq("signup", "view", "click", "purchase"), FunnelK4Lag,
        Seq(50, 90))
    },
    Some(s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(tsn) AS t FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, s1.t AS tp, MIN(e.tsn) AS t
      |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'view' AND e.tsn > s1.t
      |    AND e.tsn - s1.t <= ${FunnelK4Lag}
      |  GROUP BY e.user_id, s1.t),
      |s3 AS (
      |  SELECT e.user_id, s2.t AS tp, MIN(e.tsn) AS t
      |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'click' AND e.tsn > s2.t
      |    AND e.tsn - s2.t <= ${FunnelK4Lag}
      |  GROUP BY e.user_id, s2.t),
      |s4 AS (
      |  SELECT e.user_id, s3.t AS tp, MIN(e.tsn) AS t
      |  FROM ev e JOIN s3 ON e.user_id = s3.user_id
      |  WHERE e.event_type = 'purchase' AND e.tsn > s3.t
      |    AND e.tsn - s3.t <= ${FunnelK4Lag}
      |  GROUP BY e.user_id, s3.t),
      |l AS (
      |  SELECT 2 AS stage, 'view' AS event_type, t - tp AS lag FROM s2
      |  UNION ALL SELECT 3, 'click', t - tp FROM s3
      |  UNION ALL SELECT 4, 'purchase', t - tp FROM s4),
      |v AS (
      |  SELECT stage, event_type, lag,
      |    ROW_NUMBER() OVER (PARTITION BY stage ORDER BY lag) rn,
      |    COUNT(*) OVER (PARTITION BY stage) n
      |  FROM l),
      |e AS (SELECT stage, event_type, lag, rn, n, p
      |      FROM v, UNNEST([50, 90]) u(p))
      |SELECT CAST(stage AS INT) AS stage, event_type,
      |  CAST(n AS BIGINT) AS users, CAST(p AS INT) AS p,
      |  CAST(lag AS BIGINT) AS lag_ns
      |FROM e WHERE rn = GREATEST(1, (p * n + 99) // 100)
      |ORDER BY stage, p""".stripMargin))

  val defs: Seq[Q] =
    Seq(funnelEntry, retentionEntry, transitionsEntry, funnelK4Entry,
      funnelLagsEntry)
}
