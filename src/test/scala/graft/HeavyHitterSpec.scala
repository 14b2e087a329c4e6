package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the Count-Min-Sketch heavy-hitters entry: the CMS
  * overestimation guarantee (est >= exact, always), exact recovery of
  * the true top token, and the documented d x w sketch size.
  */
class HeavyHitterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CMS point estimates never underestimate and top-1 is recovered") {
    val out = SparkEntry.queries("text_heavy_hitters")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 10)
    out.foreach { case (w, est, exact) =>
      assert(est >= exact, s"CMS underestimated '$w': $est < $exact")
    }
    // true top token by exact count equals the sketch's top row
    val exact = Engine.table(spark, TestSpark.sf, "documents")
      .select(explode(graft.operators.TextOps.tokens(lower(col("text"))))
        .as("w"))
      .groupBy(col("w")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val trueTop = exact.maxBy(x => (x._2, x._1))._1
    // the top estimate's token must be the true top: with 31 tokens in
    // 64 buckets the dominant token ('the') leads by a wide margin, so
    // collision noise cannot reorder rank 1
    assert(out.head._1 == trueTop,
      s"sketch top '${out.head._1}' != true top '$trueTop'")
  }
}
