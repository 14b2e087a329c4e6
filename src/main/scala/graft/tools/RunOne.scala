package graft.tools
import graft.{Engine, SparkEntry}
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    try {
      args.foreach { name =>
        println(s"== $name")
        try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").show(10, truncate = false)
        catch { case e: Throwable => e.printStackTrace() }
      }
    } finally spark.stop()
  }
}
