package graft.tools

import graft.Engine
import java.nio.file.{Files, Paths}

/** Golden-file result generator (builder tool, not part of the library).
  *
  * Reads QueryTest-format files whose RESULTS sections may be empty,
  * executes each QUERY against the engine at the given scale factor, and
  * writes the completed file (existing non-empty RESULTS are preserved so
  * reference-derived expectations are never overwritten; pass
  * --regen to refresh everything). The output is then reviewed and, for
  * portable-SQL blocks, cross-checked in DuckDB by tools/golden_duck.py.
  *
  * Usage: GoldenGen <inFile-or-Dir> <outDir> [--regen] [sfDir]
  */
object GoldenGen {

  def main(args: Array[String]): Unit = {
    val regen = args.contains("--regen")
    val pos = args.filterNot(_ == "--regen")
    val in = new java.io.File(pos(0))
    val outDir = pos(1)
    val sfDir = if (pos.length > 2) pos(2) else "/root/testdata/sf0.001"
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    try {
      val files =
        if (in.isDirectory) in.listFiles().filter(_.getName.endsWith(".test")).sortBy(_.getName)
        else Array(in)
      for (f <- files) {
        val blocks = splitBlocks(Files.readString(f.toPath))
        val out = blocks.map { b => fillBlock(spark, sfDir, b, regen) }
        // trailing separator so appended blocks never merge into the last
        Files.writeString(Paths.get(s"$outDir/${f.getName}"),
          out.mkString("====\n", "====\n", "====\n"))
        println(s"[golden-gen] wrote $outDir/${f.getName} (${blocks.size} blocks)")
      }
    } finally spark.stop()
  }

  private def splitBlocks(text: String): Seq[String] =
    text.split("====").map(_.trim).filter(_.nonEmpty).toSeq

  private def fillBlock(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, block: String, regen: Boolean): String = {
    val sections = block.split("---- ").map(_.trim).filter(_.nonEmpty)
    var query = ""
    var queryRaw = ""
    var results = Seq.empty[String]
    var types: Option[String] = None
    var options: Option[String] = None
    var catches: Option[String] = None
    sections.foreach { s =>
      val lines = s.linesIterator.toSeq
      lines.head.trim match {
        case "QUERY" =>
          queryRaw = lines.tail.mkString("\n")
          query = lines.tail.filterNot(_.trim.startsWith("#")).mkString("\n").trim
        case "RESULTS" => results = lines.tail.map(_.trim).filter(_.nonEmpty)
        case "TYPES" => types = Some(lines.tail.mkString("\n").trim)
        case "OPTIONS" => options = Some(lines.tail.mkString("\n").trim)
        case "CATCH" => catches = Some(lines.tail.mkString("\n").trim)
      }
    }
    val keep = results.nonEmpty && !regen
    val newResults: Seq[String] =
      if (catches.isDefined) results
      else if (keep) results
      else {
        try {
          val df = graft.Engine.sql(spark, sfDir, query)
          df.collect().map(graft.GoldenRunner.render).toSeq
        } catch {
          case e: Throwable =>
            println(s"[golden-gen] FAILED: ${query.take(80)}... -> ${e.getMessage}")
            Seq("<<ERROR: " + Option(e.getMessage).getOrElse("?").linesIterator
              .take(1).mkString + ">>")
        }
      }
    val sb = new StringBuilder
    sb.append("---- QUERY\n").append(queryRaw.trim).append("\n")
    options.foreach(o => sb.append("---- OPTIONS\n").append(o).append("\n"))
    sb.append("---- RESULTS\n")
    newResults.foreach(r => sb.append(r).append("\n"))
    catches.foreach(c => sb.append("---- CATCH\n").append(c).append("\n"))
    types.foreach(t => sb.append("---- TYPES\n").append(t).append("\n"))
    sb.toString
  }
}
