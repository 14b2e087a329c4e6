package graft.tools
import graft.{Engine, SparkEntry}
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).count()
      println(f"TIMED $name rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    } finally spark.stop()
  }
}
