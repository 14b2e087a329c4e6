package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FileReplay

/** Pins for the file-source stream replay harness the bench and sweep
  * stream rows feed from: the replay preserves the requested order
  * ACROSS micro-batches (chunk k's max key <= chunk k+1's min), one
  * file per trigger, and the full row set round-trips exactly.
  */
class FileReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ordered chunks, one file per trigger, exact row round-trip") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(3000)((rnd.nextLong(1000000), rnd.nextInt(100)))
    val dir = FileReplay.write(rows.toDF("k", "v"), Seq("k", "v"),
      parts = 8)
    try {
      // static read-back: exact multiset
      val back = spark.read.parquet(dir)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(back.sorted.toSeq == rows.sorted)
      // per-file ranges are disjoint and ascending in replay order
      // (ascending file NAME = ascending mtime = FileStreamSource
      // order); so each micro-batch is a contiguous key range
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      assert(files.length > 1 && files.length <= 8)
      val ranges = files.map { f =>
        val c = spark.read.parquet(f.getPath)
          .agg(min(col("k")), max(col("k"))).head()
        (c.getLong(0), c.getLong(1))
      }
      ranges.sliding(2).foreach { case Array(a, b) =>
        assert(a._2 <= b._1, s"chunk ranges overlap: $a then $b")
      }
      val mtimes = files.map(_.lastModified())
      assert(mtimes.sorted.toSeq == mtimes.toSeq)
      // streamed read-back: one file per trigger, same multiset
      val name = s"replay_spec_${System.nanoTime()}"
      val q = FileReplay.read(spark, dir)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches == files.length,
        s"$batches data batches for ${files.length} files")
      val streamed = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      spark.catalog.dropTempView(name)
      assert(streamed.sorted.toSeq == rows.sorted)
    } finally FileReplay.drop(dir)
  }
}
