package graft.tools

import graft.{Engine, SparkEntry}

/** Dump formatted physical plans for named queries (or a default set of
  * scale-critical ones) — used to check broadcast choices, pushdown, and
  * codegen coverage after every operator change.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    val dir = if (args.nonEmpty && args.head.startsWith("/")) args.head
      else "/root/testdata/sf0.001"
    val names = (if (args.nonEmpty && args.head.startsWith("/")) args.tail
      else args).toSeq match {
      case Nil => Seq("q1_pricing", "q3_shipping", "q5_local_supplier",
        "q18_large_orders", "dedup_minhash", "sim_topk_dot")
      case xs => xs
    }
    try names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    } finally spark.stop()
  }
}
