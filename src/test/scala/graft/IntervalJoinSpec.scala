package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** Pins for the bucketed interval-overlap join: pair-set equality
  * against the naive theta join (random + planted boundary cases),
  * duplicate-freeness of the ownership rule, and the loud guards.
  */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)],
      shift: Int = 4, maxBuckets: Int = 1024): Seq[(Long, Long)] = {
    import spark.implicits._
    val l = a.toDF("a_id", "a_s", "a_e")
    val r = b.toDF("b_id", "b_s", "b_e")
    IntervalJoin.overlapJoin(l, r, "a_s", "a_e", "b_s", "b_e",
        shift, maxBuckets)
      .select(col("a_id"), col("b_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
  }

  private def naive(a: Seq[(Long, Long, Long)],
      b: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    for {
      (ai, as_, ae) <- a
      (bi, bs, be) <- b
      if as_ <= be && bs <= ae
    } yield (ai, bi)

  test("matches the naive theta join on random intervals, no duplicates") {
    val rnd = new scala.util.Random(7)
    val a = Seq.tabulate(200) { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, s, s + rnd.nextInt(300))
    }
    val b = Seq.tabulate(150) { i =>
      val s = rnd.nextInt(2000).toLong
      (1000L + i, s, s + rnd.nextInt(50))
    }
    val got = pairs(a, b)
    assert(got.size == got.distinct.size, "ownership rule emitted a dup")
    assert(got.sorted == naive(a, b).sorted)
  }

  test("boundary semantics: touching endpoints overlap; disjoint-by-one " +
    "does not; containment and bucket-edge starts match") {
    val a = Seq(
      (1L, 0L, 16L),     // ends exactly at b2's start (bucket edge, shift=4)
      (2L, 100L, 200L),  // contains b3
      (3L, 50L, 59L))    // disjoint from everything
    val b = Seq(
      (10L, 16L, 31L),   // touches a1 at a point
      (11L, 17L, 31L),   // one past a1 — no overlap
      (12L, 120L, 130L), // inside a2
      (13L, 60L, 61L))   // starts one after a3 ends
    val got = pairs(a, b).sorted
    assert(got == Seq((1L, 10L), (2L, 12L)))
  }

  test("a long interval spanning many buckets still pairs exactly once") {
    val a = Seq((1L, 0L, 1000L)) // 63 buckets at shift=4
    val b = Seq((10L, 500L, 505L), (11L, 999L, 2000L), (12L, 1001L, 1002L))
    assert(pairs(a, b).sorted == Seq((1L, 10L), (1L, 11L)))
  }

  test("inverted interval fails loudly") {
    val e = intercept[Exception] {
      pairs(Seq((1L, 10L, 5L)), Seq((10L, 0L, 100L)))
    }
    assert(e.getMessage.contains("inverted interval"))
  }

  test("interval wider than maxBuckets fails loudly") {
    val e = intercept[Exception] {
      pairs(Seq((1L, 0L, 10000L)), Seq((10L, 0L, 1L)), shift = 4,
        maxBuckets = 16)
    }
    assert(e.getMessage.contains("covers more than 16 buckets"))
  }

  test("driver entry equals the naive formulation at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val entry = SparkEntry.queries("join_interval")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = Engine.table(spark, d, "events")
      .select(col("event_id"), col("user_id"),
        (col("ts") - col("ts") % 1000).as("tsn"),
        col("event_type"), col("value"))
    val spans = ev.groupBy(col("user_id"),
        expr("tsn div 86400000000000").as("day"))
      .agg(min(col("tsn")).as("a_s"), max(col("tsn")).as("a_e"))
    val inc = ev.filter(col("event_type") === "error" && col("value") >= 200.0)
      .select(col("event_id").as("incident_id"),
        (col("tsn") - lit(600000000000L)).as("b_s"),
        (col("tsn") + lit(600000000000L)).as("b_e"))
    val naiveAgg = spans.join(inc,
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("total_overlap_ns"))
      .orderBy(col("incident_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(entry.nonEmpty && entry.toSeq == naiveAgg.toSeq)
  }
}
