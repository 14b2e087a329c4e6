package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** File-source stream replay (r13 verdict #6): a replay corpus is
  * written ONCE into `parts` ordered parquet chunk files
  * (range-partitioned + sorted on the replay order, chunk files
  * stamped with ascending mtimes AND ascending names —
  * FileStreamSource honors either), then read back as a streaming
  * FILE source with maxFilesPerTrigger=1: `parts` micro-batches in
  * replay order, like a MemoryStream feed, but the driver never holds
  * the corpus (a MemoryStream feed collect()s it AND retains every
  * batch for the query's lifetime — a driver-memory cap the 100x
  * events sweep would hit).
  */
object FileReplay {

  /** Write `df` as a replay dir ordered by `order`; returns the dir. */
  def write(df: DataFrame, order: Seq[String], parts: Int = 8): String = {
    val stage =
      java.nio.file.Files.createTempDirectory("graft_replay_stage")
    val dir = java.nio.file.Files.createTempDirectory("graft_replay")
    df.repartitionByRange(parts, order.map(col): _*)
      .sortWithinPartitions(order.map(col): _*)
      .write.mode("overwrite").parquet(stage.toString)
    val files = new java.io.File(stage.toString).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val base = System.currentTimeMillis() - (files.length + 1) * 60000L
    files.zipWithIndex.foreach { case (f, i) =>
      val tgt = new java.io.File(dir.toFile, f.getName)
      java.nio.file.Files.move(f.toPath, tgt.toPath)
      tgt.setLastModified(base + i * 60000L)
    }
    dir.toString
  }

  /** Open a replay dir as a 1-file-per-trigger streaming source. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)

  /** Best-effort cleanup of a replay dir. */
  def drop(dir: String): Unit =
    try {
      val f = new java.io.File(dir)
      Option(f.listFiles()).foreach(_.foreach(_.delete()))
      f.delete()
    } catch { case _: Throwable => () }
}
