package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.StreamNearDedup

/** Streaming MinHash-LSH near-dup: batch equivalence of the stateful
  * star emission. The edge set may differ from the batch star (members
  * link to the min seen at arrival), but the transitive closure must
  * be IDENTICAL for any micro-batch split — and exactly equal in the
  * single-batch case.
  */
object StreamNearDedupSpec {
  // top-level so Spark can build an encoder without an outer scope
  final case class Doc(doc_id: Long, text: String)
  final case class TDoc(doc_id: Long, text: String,
      event_time: java.sql.Timestamp)
}

class StreamNearDedupSpec extends AnyFunSuite {
  import StreamNearDedupSpec.Doc
  private lazy val spark = TestSpark.spark

  private lazy val docs: Seq[Doc] = {
    Engine.configure(spark)
    Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).limit(400)
      .collect().map(r => Doc(r.getLong(0), r.getString(1))).toSeq
  }

  private def streamEdges(chunks: Seq[Seq[Doc]], name: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = StreamNearDedup.starEdges(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      for (c <- chunks) { input.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  private def comps(edges: DataFrame): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.connectedComponents(
      edges.select(col("doc_a").as("a"), col("doc_b").as("b")).distinct())
      .as[(Long, Long)].collect().toMap
  }

  test("single micro-batch emits exactly the batch star edges") {
    import spark.implicits._
    val got = streamEdges(Seq(docs), "snd_one")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val want = DedupOps.minhashStarEdgesOf(docs.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("3-way split: connectivity identical to the batch star") {
    import spark.implicits._
    val chunks = docs.grouped((docs.size + 2) / 3).toSeq
    val streamed = comps(streamEdges(chunks, "snd_three"))
    val batch = comps(DedupOps.minhashStarEdgesOf(docs.toDF("doc_id", "text")))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("out-of-order arrival (descending ids) still converges to the same clusters") {
    import spark.implicits._
    val desc = docs.sortBy(-_.doc_id)
    val chunks = desc.grouped((desc.size + 1) / 2).toSeq
    val streamed = comps(streamEdges(chunks, "snd_desc"))
    val batch = comps(DedupOps.minhashStarEdgesOf(docs.toDF("doc_id", "text")))
    assert(streamed === batch)
  }

  test("horizon variant: state ages out, far-apart twins stop linking") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamNearDedupSpec.TDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val twinText = "identical twin document body with enough words to shingle"
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def run(name: String, chunks: Seq[Seq[TDoc]]): Set[(Long, Long)] = {
      val input = MemoryStream[TDoc]
      val q = graft.streaming.StreamNearDedup
        .starEdgesWithHorizon(input.toDF(), "1 minute")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        for (c <- chunks) { input.addData(c: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).select("doc_a", "doc_b")
        .as[(Long, Long)].collect().toSet
    }
    // twin at t0; an unrelated filler at t+10min advances the watermark
    // past the bucket's 1-minute timeout; the late twin at t+11min gets
    // a FRESH bucket — no edge to doc 1
    val far = run("snd_h1", Seq(
      Seq(TDoc(1L, twinText, ts(0))),
      Seq(TDoc(50L, "totally unrelated filler words nothing shared here at all", ts(10))),
      Seq(TDoc(2L, twinText, ts(11)))))
    assert(!far.contains((1L, 2L)), far.toString)
    // control: the same twins INSIDE the horizon do link
    val near = run("snd_h2", Seq(
      Seq(TDoc(1L, twinText, ts(0))),
      Seq(TDoc(2L, twinText, ts(0))))) // same batch window
    assert(near.contains((1L, 2L)), near.toString)
  }
}
