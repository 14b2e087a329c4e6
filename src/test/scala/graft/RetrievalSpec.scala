package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the BM25 retrieval operators: the score formula against a
  * hand-rolled scalar reference on a planted corpus, and the
  * inverted-index multi-query path against per-query brute force.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bm25 score equals a hand-computed reference on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark stream x y"),
      (1L, "vector stream stream stream z"),
      (2L, "x y z w q"),
      (3L, "spark vector stream spark vector stream"))
    val df = docs.toDF("doc_id", "text")
    val terms = Seq("spark", "vector", "stream")
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toLong
    val dls = docs.map(d => toks(d._1).size)
    val tt = dls.map(_.toLong).sum
    val dfm = terms.map(tm =>
      tm -> docs.count(d => toks(d._1).contains(tm)).toLong).toMap
    def score(id: Long): Double = {
      val dl = toks(id).size
      terms.map { tm =>
        val tf = toks(id).count(_ == tm)
        val df = dfm(tm)
        val idf = (2L * (n - df) + 1L).toDouble / (2L * df + 1L).toDouble
        val ratio = (dl.toLong * n).toDouble / tt.toDouble
        val den = tf.toDouble + 1.2 * (0.25 + 0.75 * ratio)
        idf * (tf.toDouble * 2.2 / den)
      }.reduceLeft(_ + _)
    }
    // evaluate the operator's column expression against the same corpus
    val got = graft.operators.RetrievalOps.scoreForTest(df, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.foreach { case (id, _) =>
      assert(got(id) == score(id), s"doc $id") // bit-exact, not approx
    }
  }

  test("hybrid RRF equals a scalar fusion of the two rankings at " +
    "sf0.001; both-list docs outrank equal-rank single-list docs") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("retrieval_hybrid_rrf")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // scalar reference: rebuild both top-30 rankings and fuse
    val lex = graft.operators.RetrievalOps.scoreForTest(
        Engine.table(spark, d, "documents").select(col("doc_id"),
          col("text")),
        Seq("spark", "vector", "stream"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(x => (-x._2, x._1)).take(30).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val emb = Engine.table(spark, d, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray)
    val qe = emb.find(_._1 == 0L).get._2
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + a(i).toDouble * b(i).toDouble)
    val dense = emb.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(qe, v)) }
      .sortBy(x => (-x._2, x._1)).take(30).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val fused = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val s = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, s)
    }.sortBy(x => (-x._2, x._1)).take(10)
    assert(got.toSeq == fused)
    // a doc in BOTH lists at ranks (r, r) beats one in a single list
    // at rank r — check on the reference structure when present
    val both = fused.filter(f => lex.contains(f._1) && dense.contains(f._1))
    if (both.nonEmpty) assert(fused.head._2 >= both.head._2 * 0.5)
  }

  test("multi-query top-5 equals brute force at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("retrieval_multiquery")(spark, d)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // brute force: per query, score every doc that contains >= 1 term
    val docs = Engine.table(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+")
        .filter(_.nonEmpty).toSeq)
    val queries = Seq(1 -> Seq("spark", "vector"),
      2 -> Seq("stream", "filter", "agg"), 3 -> Seq("customer", "merge"))
    val vocab = queries.flatMap(_._2).distinct
    val n = docs.length.toLong
    val tt = docs.map(_._2.size.toLong).sum
    val dfm = vocab.map(tm =>
      tm -> docs.count(_._2.contains(tm)).toLong).toMap
    val expect = queries.flatMap { case (qid, terms) =>
      val scored = docs.flatMap { case (id, tk) =>
        val hit = terms.filter(tm => tk.contains(tm)).sorted
        if (hit.isEmpty) None else {
          val dl = tk.size
          val s = hit.map { tm =>
            val tf = tk.count(_ == tm).toLong
            val df = dfm(tm)
            val idf = (2L * (n - df) + 1L).toDouble / (2L * df + 1L).toDouble
            val ratio = (dl.toLong * n).toDouble / tt.toDouble
            val den = tf.toDouble + 1.2 * (0.25 + 0.75 * ratio)
            idf * (tf.toDouble * 2.2 / den)
          }.foldLeft(0.0)(_ + _)
          Some((qid, id, hit.size, s))
        }
      }
      scored.sortBy(x => (-x._4, x._2)).take(5)
    }
    assert(out.toSeq == expect)
  }
}
