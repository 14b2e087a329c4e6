package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the behavioral-analytics entries: the distributed funnel /
  * retention plans must equal a sequential brute-force recompute from
  * the raw events, and stay partitioning-independent.
  */
class FunnelOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def rawEvents(): Array[(Long, String, Long)] = {
    Engine.configure(spark)
    Engine.table(spark, d, "events")
      .selectExpr("user_id", "event_type", "ts - ts % 1000 AS tsn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
  }

  test("funnel equals the sequential per-user chain recompute") {
    val ev = rawEvents()
    val byUser = ev.groupBy(_._1)
    var n1, n2, n3 = 0L
    var lag2, lag3 = 0L
    byUser.foreach { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        n1 += 1
        val t1 = views.min
        val clicks = es.filter(e => e._2 == "click" && e._3 > t1).map(_._3)
        if (clicks.nonEmpty) {
          n2 += 1
          val t2 = clicks.min
          lag2 += t2 - t1
          val buys = es.filter(e => e._2 == "purchase" && e._3 > t2)
            .map(_._3)
          if (buys.nonEmpty) { n3 += 1; lag3 += buys.min - t2 }
        }
      }
    }
    val got = SparkEntry.queries("events_funnel")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, n1, 0L), (2, n2, lag2), (3, n3, lag3)))
    // funnel is monotone by construction
    assert(n1 >= n2 && n2 >= n3 && n3 > 0L)
  }

  test("funnelK: 4-stage capped-window funnel equals the sequential " +
    "per-user chain with the lag cap applied at every step") {
    val cap = 2L * 86400000000000L
    val ev = rawEvents()
    val stages = Seq("signup", "view", "click", "purchase")
    val want = {
      val n = Array.fill(4)(0L)
      val lag = Array.fill(4)(0L)
      ev.groupBy(_._1).foreach { case (_, es) =>
        var t = Long.MinValue
        var alive = true
        stages.zipWithIndex.foreach { case (st, i) =>
          if (alive) {
            val cand = es.filter(e => e._2 == st &&
              (i == 0 || (e._3 > t && e._3 - t <= cap))).map(_._3)
            if (cand.isEmpty) alive = false
            else {
              val nt = cand.min
              n(i) += 1
              if (i > 0) lag(i) += nt - t
              t = nt
            }
          }
        }
      }
      stages.indices.map(i => (i + 1, n(i), lag(i))).toSeq
    }
    val got = SparkEntry.queries("events_funnel_k4")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    // the cap binds: uncapped funnelK over the same stages must reach
    // at least as many users at every stage (strictly the funnel is
    // monotone in the cap), and the uncapped 3-stage prefix equals
    // the fixed entry
    import graft.operators.FunnelOps
    val evDf = Engine.table(spark, d, "events")
      .selectExpr("user_id", "event_type", "ts - ts % 1000 AS tsn")
    val unc = FunnelOps.funnelK(evDf, stages, Long.MaxValue - 1)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    got.foreach { case (s, u, _) => assert(unc(s) >= u, s"stage $s") }
    val fixed = SparkEntry.queries("events_funnel")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val prefix = FunnelOps.funnelK(evDf,
        Seq("view", "click", "purchase"), Long.MaxValue - 1)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(prefix == fixed,
      "uncapped funnelK diverges from the fixed 3-stage entry")
  }

  test("funnel lag quantiles equal the sequential per-stage sorted " +
    "order statistics") {
    val cap = 2L * 86400000000000L
    val ev = rawEvents()
    val stages = Seq("signup", "view", "click", "purchase")
    // per-user chain, collecting each stage's individual lag
    val lags = Array.fill(4)(Seq.newBuilder[Long])
    ev.groupBy(_._1).foreach { case (_, es) =>
      var t = Long.MinValue
      var alive = true
      stages.zipWithIndex.foreach { case (st, i) =>
        if (alive) {
          val cand = es.filter(e => e._2 == st &&
            (i == 0 || (e._3 > t && e._3 - t <= cap))).map(_._3)
          if (cand.isEmpty) alive = false
          else {
            val nt = cand.min
            if (i > 0) lags(i) += nt - t
            t = nt
          }
        }
      }
    }
    val want = (1 until 4).flatMap { i =>
      val sorted = lags(i).result().sorted
      val n = sorted.size.toLong
      if (n == 0) Nil
      else Seq(50, 90).map { p =>
        val k = math.max(1L, (p * n + 99L) / 100L)
        (i + 1, stages(i), n, p, sorted((k - 1).toInt))
      }
    }
    val got = SparkEntry.queries("events_funnel_lags")(spark, d)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("retention equals the sequential cohort recompute and is " +
    "partitioning-independent") {
    val ev = rawEvents()
    val act = ev.map(e => (e._1, e._3 / 86400000000000L)).distinct
    val cohort = act.groupBy(_._1).map { case (u, ds) =>
      u -> ds.map(_._2).min }
    val want = act.map { case (u, day) => (cohort(u), day - cohort(u)) }
      .filter(_._2 <= 13)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def run(): Map[(Long, Long), Long] =
      SparkEntry.queries("events_retention")(spark, d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = run()
    assert(got == want)
    // offset 0 = full cohort sizes: sum over cohorts == distinct users
    val users = ev.map(_._1).distinct.length.toLong
    assert(got.collect { case ((_, 0L), n) => n }.sum == users)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() == want)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
