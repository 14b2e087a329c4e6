package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the PQ kernels (functions/PqKernels.scala) beyond the
  * end-to-end IvfSpec coverage: first-argmax tie rule, ADC null
  * contract, and cell_dists equivalence with the literal expression
  * tree it replaced.
  */
class PqKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def booksLit = {
    // M=2 subspaces, K=2 centroids, subDim=2
    val books = Array(
      Array(Array(1.0, 0.0), Array(1.0, 0.0)), // identical: tie -> code 0
      Array(Array(0.0, 1.0), Array(2.0, 2.0)))
    array(books.toIndexedSeq.map(b =>
      array(b.toIndexedSeq.map(c =>
        array(c.toIndexedSeq.map(lit): _*)): _*)): _*)
  }

  test("pq_encode takes the FIRST argmax on ties (array_position rule)") {
    Engine.configure(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Array(1.0f, 0.0f, 2.0f, 2.0f))).toDF("v")
    val codes = df.select(
        call_function("pq_encode", col("v"), booksLit).as("c"))
      .collect()(0).getSeq[Int](0)
    // subspace 0: identical centroids -> first index; subspace 1:
    // dot([2,2],[0,1])-0.5=1.5 vs dot([2,2],[2,2])-4=4 -> code 1
    assert(codes == Seq(0, 1))
  }

  test("pq_encode yields NULL on a wrong-length vector") {
    Engine.configure(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val r = df.select(call_function("pq_encode", col("v"), booksLit))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("pq_adc equals the per-subspace dot sum; bad codes are NULL") {
    Engine.configure(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f, 4.0f), Array(0, 1)),
      (Array(1.0f, 2.0f, 3.0f, 4.0f), Array(0, 7))).toDF("q", "c")
    val rows = df.select(
      call_function("pq_adc", col("q"), col("c"), booksLit)).collect()
    // subspace 0 code 0: dot([1,2],[1,0]) = 1; subspace 1 code 1:
    // dot([3,4],[2,2]) = 14 -> 15
    assert(rows(0).getDouble(0) == 15.0)
    assert(rows(1).isNullAt(0)) // code 7 out of range
  }

  test("cell_dists matches the literal |c|^2 - 2 x.c expression per centroid") {
    Engine.configure(spark)
    import spark.implicits._
    val cents = Array(Array(1.0, 2.0, 3.0, 4.0), Array(-1.0, 0.5, 0.0, 2.0))
    val centsLit = array(cents.toIndexedSeq.map(c =>
      array(c.toIndexedSeq.map(lit): _*)): _*)
    val df = Seq(Tuple1(Array(0.5f, -1.0f, 2.0f, 8.0f))).toDF("v")
    val kernel = df.select(
        call_function("cell_dists", col("v"), centsLit).as("d"))
      .collect()(0).getSeq[Double](0)
    val literal = df.select(array(cents.toIndexedSeq.map { c =>
        val cc = c.map(x => x * x).sum
        lit(cc) - lit(2.0) *
          call_function("dot_vec", col("v"), array(c.toIndexedSeq.map(lit): _*))
      }: _*).as("d")).collect()(0).getSeq[Double](0)
    assert(kernel == literal)
  }
}
