package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversified re-rank (sim_mmr / MmrSelect kernel). */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def select(cands: Seq[(Long, Double, Seq[Float])],
      k: Int): Seq[Long] = {
    Engine.configure(spark)
    Seq(1).toDF("one")
      .select(call_function("mmr_select",
        typedLit(cands).cast(
          "array<struct<vec_id:bigint,rel:double,embedding:array<float>>>"),
        lit(k)).as("sel"))
      .as[Seq[Long]].collect().head
  }

  test("near-duplicate of the top hit is deferred in favor of a diverse pick") {
    // a ~= b (near-identical, both highly relevant), c orthogonal and
    // less relevant: pure relevance ranks (a, b, c); MMR at lambda 0.5
    // picks a, then c (b's similarity-to-a penalty exceeds its edge)
    val a = (1L, 1.00, Seq(1.0f, 0.0f))
    val b = (2L, 0.99, Seq(0.995f, 0.1f))
    val c = (3L, 0.40, Seq(0.0f, 1.0f))
    assert(select(Seq(a, b, c), 3) === Seq(1L, 3L, 2L))
  }

  test("first pick is always the pure-relevance argmax; ties to smaller id") {
    val e = Seq(0.5f, 0.5f)
    val cands = Seq((7L, 0.8, e), (3L, 0.8, e), (9L, 0.2, e))
    assert(select(cands, 2).head === 3L)
  }

  test("k beyond candidate count selects everything once") {
    val cands = Seq((1L, 0.3, Seq(1.0f, 0.0f)), (2L, 0.2, Seq(0.0f, 1.0f)))
    assert(select(cands, 8).sorted === Seq(1L, 2L))
  }

  test("entry: every selection is one of its query's top-24 candidates") {
    Engine.configure(spark)
    val got = SparkEntry.queries("sim_mmr")(spark, TestSpark.sf)
      .as[(Long, Int, Long)].collect()
    assert(got.length === 80) // 10 queries x 8 ranks
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 8))
      assert(rs.map(_._3).distinct.length == 8)
    }
  }
}
