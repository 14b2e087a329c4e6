package graft

import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sim_ivf is deterministic (decimal-exact centroids) and bounded") {
    val run1 = graft.operators.SimilarityOps.ivfTopK(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    val run2 = graft.operators.SimilarityOps.ivfTopK(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    assert(run1 === run2)
    assert(run1.nonEmpty)
    val perQuery = run1.groupBy(_.head).values
    assert(perQuery.forall(_.size <= 3))
  }

  test("ivf scores agree with the exact dot product for returned pairs") {
    import org.apache.spark.sql.functions._
    val ivf = graft.operators.SimilarityOps
      .ivfTopK(spark, TestSpark.sf, planted = false)
      .withColumnRenamed("score", "ivf_score")
    val exact = SparkEntry.queries("sim_topk_dot")(spark, TestSpark.sf)
    // pairs present in both rankings must carry the same similarity value
    val joined = ivf.join(exact, Seq("qid", "vec_id"))
      .select(abs(col("ivf_score") - col("dot")).as("diff"))
      .collect()
    assert(joined.forall(_.getDouble(0) < 1e-9))
  }

  test("ivf recall@3 vs the exact top-3 clears the nprobe=2 floor") {
    val ivf = graft.operators.SimilarityOps
      .ivfTopK(spark, TestSpark.sf, planted = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactTop3 = SparkEntry.queries("sim_topk_dot")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (-x._3, x._2)).take(3).map(_._2).toSet)
      .toMap
    val hits = ivf.count { case (q, v) => exactTop3(q).contains(v) }
    val total = exactTop3.values.map(_.size).sum
    val recall = hits.toDouble / total
    assert(recall >= 0.5, s"recall@3 was $recall")
  }

  test("pq is deterministic and bounded per query") {
    val run1 = graft.operators.SimilarityOps
      .pqTopK(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    val run2 = graft.operators.SimilarityOps
      .pqTopK(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    assert(run1 === run2)
    assert(run1.nonEmpty)
    assert(run1.groupBy(_.head).values.forall(_.size <= 3))
  }

  test("pq re-ranked scores are exact dots and recall clears a floor") {
    import org.apache.spark.sql.functions._
    val pq = graft.operators.SimilarityOps
      .pqTopK(spark, TestSpark.sf, planted = false)
      .withColumnRenamed("score", "pq_score")
    val exactAll = SparkEntry.queries("sim_topk_dot")(spark, TestSpark.sf)
    // the refine step re-scores with the exact kernel, so shared pairs
    // carry identical similarity values
    val shared = pq.join(exactAll, Seq("qid", "vec_id"))
      .select(abs(col("pq_score") - col("dot")).as("diff")).collect()
    shared.foreach(r => assert(r.getDouble(0) < 1e-9))
    // recall@3 against the exact top-3, bounded by nprobe=2 cells and the
    // quantized shortlist
    val got = pq.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exactTop3 = exactAll.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (-x._3, x._2)).take(3).map(_._2).toSet)
      .toMap
    val hits = got.count { case (q, v) => exactTop3(q).contains(v) }
    val recall = hits.toDouble / exactTop3.values.map(_.size).sum
    assert(recall >= 0.4, s"pq recall@3 was $recall")
  }

  test("the sim_ivf driver entry recovers every planted query twin") {
    val rows = SparkEntry.queries("sim_ivf")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10)
    assert(rows.forall { case (q, v) => v == q + 10000000L })
  }

  test("the sim_pq driver entry recovers every planted twin through ADC") {
    val rows = SparkEntry.queries("sim_pq")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10)
    assert(rows.forall { case (q, v) => v == q + 10000000L })
  }
}
