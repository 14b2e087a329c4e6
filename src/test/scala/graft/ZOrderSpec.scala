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

  test("out-of-budget inputs fail loudly instead of interleaving garbage") {
    import spark.implicits._
    for (bad <- Seq(-1L, 1L << 21, Long.MaxValue)) {
      val e = intercept[Exception] {
        Seq((bad, 5L)).toDF("x", "y")
          .select(ZOrder.zOrderKey(Seq(col("x"), col("y")), 21))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("zOrderKey")), s"bad=$bad: $e")
    }
    // in-budget values still interleave exactly
    val ok = Seq(((1L << 21) - 1, 0L)).toDF("x", "y")
      .select(ZOrder.zOrderKey(Seq(col("x"), col("y")), 21).as("z"))
      .head().getLong(0)
    assert(ok == mortonRef((1L << 21) - 1, 0L, 21))
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

  /** Parquet ROW-GROUP (min, max) stats of columns x, y per file, read
    * from the real footers — exactly the statistics any min/max file
    * skipper (Spark's parquet filter pushdown, a lakehouse scan
    * planner) consults.
    */
  private def footerStats(dir: String): Array[(Long, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val rdr = ParquetFileReader.open(in)
        try rdr.getFooter.getBlocks.asScala.map { b =>
          def mm(name: String): (Long, Long) = {
            val st = b.getColumns.asScala
              .find(_.getPath.toDotString == name).get.getStatistics
            (st.genericGetMin.asInstanceOf[Number].longValue,
              st.genericGetMax.asInstanceOf[Number].longValue)
          }
          val (x0, x1) = mm("x"); val (y0, y1) = mm("y")
          (x0, x1, y0, y1)
        }.toSeq
        finally rdr.close()
      }
  }

  test("Z-ordered parquet FILES prune 2-D boxes via real footer min/max " +
    "stats (the 100 TB claim, through the actual sink)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val pts = Seq.fill(20000)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong)).toDF("x", "y")
    val files = 64
    val base = java.nio.file.Files
      .createTempDirectory("zorder_sink").toString
    val zDir = s"$base/z"; val xDir = s"$base/x"
    try {
      ZOrder.clusterByZOrder(pts, Seq("x", "y"), 10, files)
        .write.parquet(zDir)
      pts.repartitionByRange(files, col("x"))
        .sortWithinPartitions(col("x")).write.parquet(xDir)
      val zStats = footerStats(zDir)
      val xStats = footerStats(xDir)
      assert(zStats.length >= files / 2, s"${zStats.length} row groups")
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
      val zy = candidates(zStats, yStripes)
      val xy = candidates(xStats, yStripes)
      val zx = candidates(zStats, xStripes)
      val xx = candidates(xStats, xStripes)
      info(f"row groups hit of ${zStats.length} — y-stripes: zorder " +
        f"$zy%.1f vs x-sort $xy%.1f; x-stripes: zorder $zx%.1f vs $xx%.1f")
      // same trade as the in-memory pin, now on REAL written files:
      // a y-only box reads 4x+ fewer z-ordered row groups than
      // x-sorted ones; x-only boxes stay within a constant factor
      assert(zy * 4 <= xy, s"file-level y-stripe pruning: $zy vs $xy")
      assert(zx <= 4 * xx, s"file-level x-stripe blowup: $zx vs $xx")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("driver entry emits one key per order, exact oracle shape") {
    val out = SparkEntry.queries("layout_zorder")(spark, TestSpark.sf)
    val n = Engine.table(spark, TestSpark.sf, "orders").count()
    assert(out.count() == n)
  }
}
