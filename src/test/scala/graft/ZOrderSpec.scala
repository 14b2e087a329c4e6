package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Pins for Z-order layout clustering: Morton-key correctness against
  * a bit-twiddling reference and the QUANTITATIVE pruning win —
  * min/max partition stats under a Z-order layout must prune 2-D box
  * queries strictly better than a single-column sort of the same
  * data.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zOrderKey equals the bit-twiddling reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 21).toLong,
      rnd.nextInt(1 << 21).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zOrderKey(Seq(col("x"), col("y")), 21).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 21), s"($x, $y)")
    }
  }

  /** Per-partition (min, max) of both dimensions under a layout. */
  private def partStats(df: org.apache.spark.sql.DataFrame)
      : Array[(Long, Long, Long, Long)] =
    df.groupBy(spark_partition_id().as("__p"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("Z-order layout prunes 2-D box queries better than a " +
    "single-column sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val pts = Seq.fill(20000)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong)).toDF("x", "y")
    val files = 64
    val zorder = ZOrder.clusterByZOrder(pts, Seq("x", "y"), 10, files)
    val xsort = pts.repartitionByRange(files, col("x"))
      .sortWithinPartitions(col("x"))
    val zStats = partStats(zorder)
    val xStats = partStats(xsort)
    // candidate partitions = those whose min/max envelope overlaps the
    // query box (exactly what min/max file skipping sees)
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
    val zx = candidates(zStats, xStripes)
    val xx = candidates(xStats, xStripes)
    val zy = candidates(zStats, yStripes)
    val xy = candidates(xStats, yStripes)
    info(f"avg candidates of $files — x-stripes: zorder $zx%.1f vs " +
      f"x-sort $xx%.1f; y-stripes: zorder $zy%.1f vs x-sort $xy%.1f")
    // the multi-dimensional trade z-order exists for: the x-sort reads
    // EVERY partition for a y-only predicate, the z-order layout reads
    // a tile band (4x+ fewer); on x-only predicates z-order stays
    // within a constant factor of the perfectly-x-sorted layout
    assert(zy * 4 <= xy, s"y-stripe pruning: zorder $zy vs x-sort $xy")
    assert(zx <= 4 * xx, s"x-stripe blowup: zorder $zx vs x-sort $xx")
  }

  test("driver entry emits one key per order, exact oracle shape") {
    val out = SparkEntry.queries("layout_zorder")(spark, TestSpark.sf)
    val n = Engine.table(spark, TestSpark.sf, "orders").count()
    assert(out.count() == n)
  }
}
