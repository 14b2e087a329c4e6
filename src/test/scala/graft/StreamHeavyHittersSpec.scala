package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.streaming.StreamHeavyHitters

/** Pins for the streaming CMS: batch equivalence under any micro-batch
  * split, the 256-cell state bound (sketch-bounded, not
  * vocabulary-bounded), and the one-sided est >= exact guarantee
  * queried from the final cells.
  */
class StreamHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Replay docs in `splits` micro-batches; return (final cells,
    * final-progress state rows).
    */
  private def replay(docs: Seq[(Long, String)],
      splits: Int): (Map[(Int, Int), Long], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val name = s"hh_test_${System.nanoTime()}"
    val input = MemoryStream[(Long, String)]
    val q = StreamHeavyHitters.cells(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    var stateRows = -1L
    try {
      docs.grouped(math.max(1, (docs.size + splits - 1) / splits))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    // counts are monotone, so the last emission per cell is its max
    val cells = spark.table(name)
      .groupBy(col("r"), col("b")).agg(max(col("cell")).as("cell"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    spark.catalog.dropTempView(name)
    (cells, stateRows)
  }

  /** Batch CMS cells of the same corpus via the same expressions. */
  private def batchCells(docs: Seq[(Long, String)])
      : Map[(Int, Int), Long] = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(explode(TextOps.tokens(lower(col("text")))).as("w"))
      .select(explode(array((0 until 4).map(r =>
        struct(lit(r).as("r"), TextOps.cmsBucket(r, col("w")).as("b"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cell"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  private lazy val corpus: Seq[(Long, String)] =
    Engine.table(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("final cells equal the batch sketch — single batch and 5-way " +
    "split identical") {
    val want = batchCells(corpus)
    val (one, _) = replay(corpus, 1)
    val (five, _) = replay(corpus, 5)
    assert(one == want)
    assert(five == want)
  }

  test("state is sketch-bounded: <= 256 rows whatever flows through") {
    val (cells, stateRows) = replay(corpus, 4)
    assert(cells.size <= 256)
    assert(stateRows >= 0 && stateRows <= 256,
      s"state_rows=$stateRows — must be bounded by d*w, not vocabulary")
  }

  test("point queries from the final cells: est >= exact for every word") {
    import spark.implicits._
    val (cells, _) = replay(corpus, 3)
    val exact = corpus.flatMap(_._2.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    // recompute each word's buckets with the shared expression
    val words = exact.keys.toSeq.sorted
    val buckets = words.toDF("w")
      .select(col("w") +: (0 until 4).map(r =>
        TextOps.cmsBucket(r, col("w")).as(s"b$r")): _*)
      .collect().map(r => r.getString(0) ->
        (0 until 4).map(i => r.getInt(i + 1))).toMap
    words.foreach { w =>
      val est = (0 until 4).map(r => cells((r, buckets(w)(r)))).min
      assert(est >= exact(w), s"word $w: est $est < exact ${exact(w)}")
    }
  }
}
