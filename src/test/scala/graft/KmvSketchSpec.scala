package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the KMV / theta set-operation sketches: sketch content is
  * exactly the bottom-k distinct values (partitioning- and
  * duplication-independent), the NDV estimator lands within the
  * k-sample error band on known cardinalities, planted overlaps are
  * recovered, and the below-k path is exact.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(vals: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    Engine.configure(spark)
    vals.toDF("h").repartition(parts)
      .agg(call_function("kmv_sketch", col("h"), lit(k)))
      .head().getSeq[Long](0)
  }

  test("sketch content = bottom-k distinct values, any partitioning") {
    val rnd = new scala.util.Random(3)
    val vals = Seq.fill(5000)(rnd.nextLong().abs % (1L << 52))
    val expect = vals.distinct.sorted.take(64)
    for (parts <- Seq(1, 7, 32)) {
      assert(sketchOf(vals ++ vals, 64, parts) == expect, s"parts=$parts")
    }
  }

  test("below-k sketches are the exact distinct set") {
    val vals = Seq(9L, 3L, 3L, 7L, 1L)
    assert(sketchOf(vals, 16, 3) == Seq(1L, 3L, 7L, 9L))
  }

  test("NDV estimate within the k-sample band on known cardinality") {
    // hash uniformly via the same md5-52 recipe the entries use
    Engine.configure(spark)
    val n = 20000
    val df = spark.range(n).select(
      graft.operators.SketchOps.hash52(col("id").cast("string")).as("h"))
    val k = 256
    val sk = df.agg(call_function("kmv_sketch", col("h"), lit(k)))
      .head().getSeq[Long](0)
    val est = (k - 1).toDouble / (sk(k - 1).toDouble / 4503599627370496.0)
    // relative SE ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
    assert(math.abs(est - n) < n * 0.25, s"est=$est for n=$n")
  }

  test("theta set ops recover a planted overlap") {
    Engine.configure(spark)
    def hashed(lo: Int, hi: Int) = spark.range(lo, hi).select(
      graft.operators.SketchOps.hash52(col("id").cast("string")).as("h"))
    val k = 128
    def sk(lo: Int, hi: Int): Seq[Long] =
      hashed(lo, hi).agg(call_function("kmv_sketch", col("h"), lit(k)))
        .head().getSeq[Long](0)
    val a = sk(0, 3000) // |A| = 3000
    val b = sk(1500, 4500) // |B| = 3000, |A & B| = 1500, |A | B| = 4500
    val theta = math.min(a(k - 1), b(k - 1)).toDouble / 4503599627370496.0
    val thL = math.min(a(k - 1), b(k - 1))
    val fa = a.filter(_ < thL).toSet
    val fb = b.filter(_ < thL).toSet
    val unionEst = (fa ++ fb).size / theta
    val interEst = fa.intersect(fb).size / theta
    assert(math.abs(unionEst - 4500) < 4500 * 0.35, s"union=$unionEst")
    assert(math.abs(interEst - 1500) < 1500 * 0.6, s"inter=$interEst")
    val jac = interEst / unionEst
    assert(jac > 0.15 && jac < 0.55, s"jaccard=$jac")
  }

  test("driver entries emit consistent estimates") {
    val ndv = SparkEntry.queries("agg_kmv_ndv")(spark, TestSpark.sf)
      .collect()
    assert(ndv.nonEmpty)
    ndv.foreach { r =>
      val exact = r.getLong(1); val est = r.getDouble(2)
      // sf0.001 sits below k (exact path); larger SFs estimate
      assert(est > 0 && (est == exact.toDouble ||
        math.abs(est - exact) < exact * 0.8),
        s"lang ${r.getString(0)}: est $est vs exact $exact")
    }
    val ov = SparkEntry.queries("set_overlap_kmv")(spark, TestSpark.sf)
      .head()
    assert(ov.getDouble(2) >= ov.getDouble(3), "union < intersection")
    val jac = ov.getDouble(4)
    assert(jac >= 0.0 && jac <= 1.0)
  }
}
