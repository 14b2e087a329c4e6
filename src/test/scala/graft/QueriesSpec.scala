package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must at least analyze (resolve + type-check)
  * against the real testdata schemas; the flagship entry must execute.
  * Value correctness is covered by the DuckDB oracle gate
  * (tools/check_oracle.py / driver t2).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registry is consistent") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.all.map(_.name).distinct.size === SparkEntry.all.size)
  }

  for (q <- SparkEntry.all) {
    test(s"${q.name} analyzes") {
      val df = q.run(spark, TestSpark.sf)
      assert(df.schema.fields.nonEmpty)
    }
  }

  test("entry executes with rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dedup_exact finds no duplicates in distinct corpus but keeps all docs") {
    val df = SparkEntry.queries("dedup_exact")(spark, TestSpark.sf)
    val n = df.count()
    assert(n === 500)
  }

  test("multimodal feature extraction is deterministic") {
    val a = SparkEntry.queries("multimodal_features")(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val b = SparkEntry.queries("multimodal_features")(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("sim_lsh_bucket (organic) returns at most 3 neighbours per query") {
    val rows = graft.operators.SimilarityOps
      .lshBucket(spark, TestSpark.sf, planted = false)
      .groupBy("qid").count().collect()
    assert(rows.forall(_.getLong(1) <= 3))
  }

  test("the sim_lsh_bucket driver entry recovers every planted query twin") {
    val rows = SparkEntry.queries("sim_lsh_bucket")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10)
    assert(rows.forall { case (q, v) => v == q + 10000000L })
  }

  test("multimodal_embed_knn (organic) is bounded and deterministic") {
    val run1 = graft.operators.MultimodalOps
      .embedKnnTopK(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    val run2 = graft.operators.MultimodalOps
      .embedKnnTopK(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    assert(run1 === run2)
    assert(run1.nonEmpty)
    assert(run1.groupBy(_.head).values.forall(_.size <= 3))
  }

  test("the multimodal_embed_knn entry recovers every planted payload twin at cosine 1") {
    val rows = SparkEntry.queries("multimodal_embed_knn")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 5)
    assert(rows.forall { case (q, v, c) => v == q + 10000000L && c == 1.0 })
  }
}
