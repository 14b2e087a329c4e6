package graft.tools

import graft.Engine

/** Dev tool: run `;`-separated SQL statements from a file against the
  * local testdata, printing each result (golden-file authoring aid).
  * Usage: runMain graft.tools.SqlFile <file.sql> [sfDir]
  */
object SqlFile {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Engine.session("8")
    val text = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try src.mkString finally src.close()
    }
    try {
      text.split(";\\s*\n").map(_.trim).filter(_.nonEmpty).foreach { q =>
        println(s"-- $q")
        try {
          val df = Engine.sql(spark, dir, q)
          df.show(100, truncate = false)
          println(s"   [types: ${df.schema.fields.map(_.dataType.sql).mkString(", ")}]")
          df.collect().foreach(r => println("   " + graft.GoldenRunner.render(r, impala = true)))
        } catch { case e: Throwable =>
          println(s"ERROR: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}")
        }
      }
    } finally spark.stop()
  }
}
