package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertKernel
import graft.operators.{HilbertCurve, ZOrder}

/** Pins for the Hilbert layout: the curve's DEFINING properties
  * (bijectivity via the independent inverse map, unit-step adjacency
  * — the locality guarantee Morton keys lack), known first-quadrant
  * values, the loud out-of-range guard, and the pruning win on real
  * parquet footer statistics.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bits=1 base case walks the canonical U shape") {
    assert(HilbertKernel.xy2d(1, 0L, 0L) == 0L)
    assert(HilbertKernel.xy2d(1, 0L, 1L) == 1L)
    assert(HilbertKernel.xy2d(1, 1L, 1L) == 2L)
    assert(HilbertKernel.xy2d(1, 1L, 0L) == 3L)
  }

  test("bijective on the full 32x32 grid and inverse-consistent") {
    val bits = 5
    val keys = for (x <- 0L until 32L; y <- 0L until 32L)
      yield HilbertKernel.xy2d(bits, x, y)
    assert(keys.distinct.size == 1024)
    assert(keys.min == 0L && keys.max == 1023L)
    for (d <- 0L until 1024L) {
      val (x, y) = HilbertKernel.d2xy(bits, d)
      assert(HilbertKernel.xy2d(bits, x, y) == d, s"d=$d")
    }
  }

  test("consecutive keys are ALWAYS Manhattan-adjacent cells (the " +
    "locality property the Morton curve lacks)") {
    val bits = 6
    val byKey = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield HilbertKernel.xy2d(bits, x, y) -> (x, y)).sortBy(_._1)
    byKey.sliding(2).foreach { case Seq((d1, (x1, y1)), (d2, (x2, y2))) =>
      assert(d2 == d1 + 1)
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"jump at d=$d1: ($x1,$y1) -> ($x2,$y2)")
    }
    // and the Morton curve genuinely fails this (sanity of the claim)
    val mortonAdj = (for (x <- 0L until 64L; y <- 0L until 64L) yield {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((x >> i) & 1L) << (2 * i); z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z -> (x, y)
    }).sortBy(_._1).sliding(2).forall {
      case Seq((_, (x1, y1)), (_, (x2, y2))) =>
        math.abs(x2 - x1) + math.abs(y2 - y1) == 1
    }
    assert(!mortonAdj)
  }

  test("codegen'd column expression equals the scalar kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 21).toLong,
      rnd.nextInt(1 << 21).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertCurve.hilbertKey(col("x"), col("y"), 21).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == HilbertKernel.xy2d(21, x, y), s"($x, $y)")
    }
  }

  test("out-of-range points fail loudly") {
    import spark.implicits._
    for (bad <- Seq(-1L, 1L << 21, Long.MaxValue)) {
      val e = intercept[Exception] {
        Seq((bad, 5L)).toDF("x", "y")
          .select(HilbertCurve.hilbertKey(col("x"), col("y"), 21))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("hilbert_key")), s"bad=$bad: $e")
    }
  }

  test("Hilbert layout prunes 2-D boxes at least as well as Z-order " +
    "(partition min/max envelopes) and 4x better than an x-sort on " +
    "y-stripes") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val pts = Seq.fill(20000)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong)).toDF("x", "y")
    val files = 64
    def partStats(df: org.apache.spark.sql.DataFrame)
        : Array[(Long, Long, Long, Long)] =
      df.groupBy(spark_partition_id().as("__p"))
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
          min(col("y")).as("y0"), max(col("y")).as("y1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val hStats = partStats(
      HilbertCurve.clusterByHilbert(pts, "x", "y", 10, files))
    val zStats = partStats(
      ZOrder.clusterByZOrder(pts, Seq("x", "y"), 10, files))
    val xStats = partStats(pts.repartitionByRange(files, col("x"))
      .sortWithinPartitions(col("x")))
    def candidates(stats: Array[(Long, Long, Long, Long)],
        boxes: Seq[(Long, Long, Long, Long)]): Double =
      boxes.map { case (bx0, bx1, by0, by1) =>
        stats.count { case (x0, x1, y0, y1) =>
          x1 >= bx0 && x0 <= bx1 && y1 >= by0 && y0 <= by1
        }
      }.sum.toDouble / boxes.size
    val starts = Seq.fill(100)(rnd.nextInt(960).toLong)
    val xStripes = starts.map(s => (s, s + 63L, 0L, 1023L))
    val yStripes = starts.map(s => (0L, 1023L, s, s + 63L))
    val hy = candidates(hStats, yStripes)
    val zy = candidates(zStats, yStripes)
    val xy = candidates(xStats, yStripes)
    val hx = candidates(hStats, xStripes)
    val xx = candidates(xStats, xStripes)
    info(f"avg candidates of $files — y-stripes: hilbert $hy%.1f, " +
      f"zorder $zy%.1f, x-sort $xy%.1f; x-stripes: hilbert $hx%.1f, " +
      f"x-sort $xx%.1f")
    assert(hy * 4 <= xy, s"y-stripe pruning: hilbert $hy vs x-sort $xy")
    assert(hx <= 4 * xx, s"x-stripe blowup: hilbert $hx vs x-sort $xx")
    // locality should make hilbert no worse than zorder (small slack
    // for partition-boundary luck)
    assert(hy <= zy * 1.15, s"hilbert $hy vs zorder $zy on y-stripes")
  }

  test("driver entry emits one key per order") {
    val out = SparkEntry.queries("layout_hilbert")(spark, TestSpark.sf)
    val n = Engine.table(spark, TestSpark.sf, "orders").count()
    assert(out.count() == n)
  }
}
