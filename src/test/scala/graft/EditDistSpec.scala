package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the edit-distance fuzzy dedup (DedupOps.editDistancePairs):
  * planted twins carry KNOWN exact distances (0/2/4/6 suffix
  * insertions), the banded levenshtein's -1 sentinel excludes
  * past-threshold pairs, and the relative length criterion holds on
  * every emitted pair.
  */
class EditDistSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("planted twins surface with their exact insertion distances") {
    Engine.configure(spark)
    val out = DedupOps.editDistancePairs(spark, TestSpark.sf)
      .filter(col("doc_b") === col("doc_a") + 10000000L)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = r.getAs[Long]("doc_a")
      val dist = r.getAs[Int]("dist")
      assert(dist == 2 * (a % 4).toInt,
        s"twin of $a: dist $dist != ${2 * (a % 4)}")
    }
    // every doc_id % 20 == 0 doc has enough shingles to block with its
    // twin at sf0.001's shortest texts — no planted twin goes missing
    val planted = spark.read
      .parquet(s"${TestSpark.sf}/documents.parquet")
      .filter(col("doc_id") % 20 === 0).count()
    assert(out.length == planted.toInt)
  }

  test("banded levenshtein sentinel and relative criterion hold") {
    import spark.implicits._
    // banded verify: -1 past the threshold band, exact within it
    val r = spark.range(1).select(
      levenshtein(lit("a" * 100), lit("b" * 100), 40).as("far"),
      levenshtein(lit("kitten"), lit("sitting"), 40).as("near"))
      .head()
    assert(r.getAs[Int]("far") == -1 && r.getAs[Int]("near") == 3)
    val out = DedupOps.editDistancePairs(spark, TestSpark.sf).as[
      (Long, Long, Long, Int)].collect()
    out.foreach { case (_, _, shared, dist) =>
      assert(dist >= 0 && dist <= 40 && shared >= 2)
    }
  }
}
