package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactQuantile

/** Pins for distributed exact selection: order-statistic equality with
  * a sorted reference (duplicates, negatives, extremes) and the
  * logarithmic round bound that makes it a scan-count win over a
  * global sort.
  */
class ExactQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kth-smallest equals the sorted reference on a messy domain") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // heavy duplicates, negatives, and a huge-magnitude outlier pair
    val vals = Seq.fill(5000)(rnd.nextInt(200) - 100L) ++
      Seq(Long.MinValue / 4, Long.MaxValue / 4)
    val df = vals.toDF("v").repartition(7)
    val sorted = vals.sorted
    for (k <- Seq(1L, 2L, 500L, 2501L, 4999L, vals.size.toLong)) {
      val (got, rounds) = ExactQuantile.kthSmallest(df, col("v"), k)
      assert(got == sorted((k - 1).toInt), s"k=$k")
      // range ~ 2^61 -> at most ceil(61/12) = 6 rounds of 4096-way refine
      assert(rounds <= 6, s"k=$k took $rounds rounds")
    }
  }

  test("constant column resolves in zero rounds; k bounds enforced") {
    import spark.implicits._
    val df = Seq.fill(100)(42L).toDF("v")
    val (v, rounds) = ExactQuantile.kthSmallest(df, col("v"), 50L)
    assert(v == 42L && rounds == 0)
    intercept[IllegalArgumentException] {
      ExactQuantile.kthSmallest(df, col("v"), 101L)
    }
  }

  test("multi-k shared refinement equals repeated single-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vals = Seq.fill(4000)(rnd.nextLong() % 1000000L)
    val df = vals.toDF("v").repartition(5)
    val ks = Seq(1L, 7L, 2000L, 3600L, 3999L)
    val (multi, _) = ExactQuantile.kthSmallestMulti(df, col("v"), ks)
    ks.foreach { k =>
      assert(multi(k) == ExactQuantile.kthSmallest(df, col("v"), k)._1,
        s"k=$k")
    }
  }

  test("grouped multi-k shares passes across tags and equals per-tag " +
    "selection — overlapping value ranges, skewed tag sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // three tags with overlapping domains and very different sizes
    val rows = Seq.tabulate(3000)(i => (2, rnd.nextLong() % 500000L)) ++
      Seq.tabulate(700)(i => (3, 250000L + rnd.nextLong() % 500000L)) ++
      Seq.tabulate(11)(i => (4, rnd.nextLong() % 64L))
    val df = rows.toDF("t", "v").repartition(5)
    val ks = Map(2 -> Seq(1L, 1500L, 3000L), 3 -> Seq(350L, 700L),
      4 -> Seq(1L, 11L))
    val (got, rounds) = ExactQuantile.kthSmallestMultiGrouped(
      df, col("t"), col("v"), ks)
    ks.foreach { case (t, tks) =>
      val sub = rows.filter(_._1 == t).map(_._2).toDF("v")
      val (want, _) = ExactQuantile.kthSmallestMulti(sub, col("v"), tks)
      tks.foreach(k => assert(got((t, k)) == want(k), s"t=$t k=$k"))
    }
    assert(rounds <= 4, s"rounds=$rounds — shared passes regressed")
    // percentilesGrouped: same definition as the per-relation path
    val byTag = ExactQuantile.percentilesGrouped(
      df, col("t"), col("v"), Seq(50, 90))
    ks.keys.foreach { t =>
      val sub = rows.filter(_._1 == t).map(_._2).toDF("v")
      val (n, pv) = ExactQuantile.percentilesWithCount(
        sub, col("v"), Seq(50, 90))
      assert(byTag(t) == ((n, pv)), s"t=$t")
    }
    // a tag whose values are ALL null is omitted, like an absent tag
    // (not an NPE on the NULL min in the bounds collect)
    val withNulls = rows.map { case (t, v) =>
      (t, java.lang.Long.valueOf(v)) } ++
      Seq((9, null.asInstanceOf[java.lang.Long]),
        (9, null.asInstanceOf[java.lang.Long]))
    val byTag2 = ExactQuantile.percentilesGrouped(
      withNulls.toDF("t", "v"), col("t"), col("v"), Seq(50))
    assert(!byTag2.contains(9) && byTag2.keySet == ks.keySet)
  }

  test("exact at the top of the long domain (upper-edge overflow guard)") {
    import spark.implicits._
    // hi within one bucket width of Long.MaxValue: the naive
    // lo + width - 1 upper edge wraps negative (r11 ADVICE medium)
    val vals = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MaxValue - 7,
      Long.MaxValue / 2 + 3, Long.MaxValue / 2)
    val df = vals.toDF("v").repartition(2)
    val sorted = vals.sorted
    for (k <- 1 to vals.size) {
      val (got, _) = ExactQuantile.kthSmallest(df, col("v"), k.toLong)
      assert(got == sorted(k - 1), s"k=$k")
    }
  }

  test("three percentiles cost one bounds pass plus shared rounds") {
    import spark.implicits._
    val vals = (1L to 5000L).map(i => (i * 2654435761L) % 100000L)
    val df = vals.toDF("v").repartition(4)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // listener events are async: poll until the count stops moving
    def settled(): Int = {
      var prev = -1
      var cur = jobs.get()
      var waited = 0
      while (cur != prev && waited < 5000) {
        prev = cur; Thread.sleep(200); waited += 200; cur = jobs.get()
      }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE materializes each query stage as its own job, which would
    // make the count a multiple of the pass count — switch it off so
    // one pass over the data is exactly one job.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val n = df.count() // not part of the operator's budget
      settled()
      jobs.set(0)
      val got = ExactQuantile.percentiles(df, col("v"), Seq(50, 90, 99))
      // range < 2^17 -> at most ceil(17/8)=3 shared rounds + 1 count
      // + 1 bounds pass; the pre-multi implementation spent 12 jobs
      val ran = settled()
      assert(ran <= 5, s"multi-k refinement ran $ran jobs")
      val sorted = vals.sorted
      def ref(p: Int): Long = sorted((math.max(1L,
        (p * n + 99) / 100) - 1).toInt)
      assert(got == Map(50 -> ref(50), 90 -> ref(90), 99 -> ref(99)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("driver entry matches DuckDB-style order statistics") {
    val out = SparkEntry.queries("exact_quantiles")(spark, TestSpark.sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val qs = Engine.table(spark, TestSpark.sf, "lineitem")
      .select(col("l_quantity").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    def ref(p: Int): Double = qs(math.max(1, (p * qs.length + 99) / 100) - 1)
    assert(out == Map(50 -> ref(50), 90 -> ref(90), 99 -> ref(99)))
  }

  test("grouped percentiles equal a per-group scalar sort reference at " +
    "sf0.001, duplicates included") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("exact_quantiles_grouped")(spark, d)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val rows = Engine.table(spark, d, "lineitem")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      Seq(50, 90, 99).map { p =>
        val k = math.max(1L, (p.toLong * sorted.length + 99) / 100)
        (g, p, sorted((k - 1).toInt) / 100.0)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expect)
  }
}
