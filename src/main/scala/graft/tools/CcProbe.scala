package graft.tools

import graft.Engine
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Dev scratchpad: time the dedup connected-components loop on the
  * full-star edge set (round count + wall per phase).
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("32")
    def ms(t0: Long) = (System.nanoTime() - t0) / 1e6
    var t0 = System.nanoTime()
    val pairs = DedupOps.simhashStarEdgesFullOf(
      DedupOps.simhashBands(spark, d, planted = true))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .localCheckpoint()
    println(f"edge derivation+checkpoint: ${ms(t0)}%.0f ms rows=${pairs.count()}")
    t0 = System.nanoTime()
    val (labels, rounds, conv) =
      DedupOps.connectedComponentsWithRounds(pairs)
    println(f"cc: ${ms(t0)}%.0f ms rounds=$rounds converged=$conv " +
      s"labels=${labels.count()}")
    t0 = System.nanoTime()
    val (l2, r2, c2) = DedupOps.connectedComponentsWithRounds(pairs)
    println(f"cc warm: ${ms(t0)}%.0f ms rounds=$r2 converged=$c2 " +
      s"labels=${l2.count()}")
    spark.stop()
  }
}
