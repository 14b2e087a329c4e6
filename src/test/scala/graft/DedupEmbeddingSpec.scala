package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupEmbeddingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brutePairs(tau: Double): Set[(Long, Long)] = {
    val emb = Engine.table(spark, TestSpark.sf, "embeddings")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, p) => acc + p)
    val l = emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val r = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("e_a"), col("e_b")) /
          (sqrt(dot(col("e_a"), col("e_a"))) *
           sqrt(dot(col("e_b"), col("e_b"))))).as("cos"))
      .filter(col("cos") >= tau)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
  }

  test("LSH-bucketed cosine near-dup matches brute force at tau=0.45") {
    val got = graft.operators.DedupOps.embeddingNearDup(
        Engine.table(spark, TestSpark.sf, "embeddings")
          .select(col("vec_id"), col("embedding")),
        tau = 0.45, bandBits = 4, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brutePairs(0.45)
    // exact verify means no false positives; band recall must cover all
    assert(got === want)
    assert(want.nonEmpty, "test data has no pairs above 0.45 — weaken tau")
  }

  test("planted near-duplicates are found at production tau=0.9, 8-bit bands") {
    import spark.implicits._
    val emb = Engine.table(spark, TestSpark.sf, "embeddings")
      .filter(col("vec_id") < 50)
    // plant twins: copy each vector with a tiny deterministic perturbation
    // (cosine vs original ~0.9996) under vec_id+100000
    val twins = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => (x.cast("double") * 1.001 +
          when(i % 7 === 0, lit(0.003)).otherwise(lit(0.0))).cast("float"))
        .as("embedding"))
    val planted = emb.select(col("vec_id"), col("embedding"))
      .unionByName(twins)
    val found = DedupOps.embeddingNearDup(planted, tau = 0.9,
        bandBits = 8, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 50L).map(i => (i, i + 100000)).toSet
    assert(expected.subsetOf(found),
      s"missing planted pairs: ${(expected -- found).take(5)}")
    // everything found must really clear the cosine bar (exact verify)
    assert(found.forall { case (a, b) => a < b })
  }
}
