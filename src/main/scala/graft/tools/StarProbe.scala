package graft.tools

import graft.Engine
import graft.operators.DedupOps

/** Dev scratchpad: star-emission vs all-pairs LSH dedup scaling
  * (r8 verdict #2 — the 10x replicated corpus makes every document a
  * 10-way dup clique, the worst case for all-pairs emission).
  */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = Engine.session("32")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (dir <- dirs) {
      println(s"== $dir")
      val ms = time(s"minhash_star")(DedupOps.minhashStarEdges(spark, dir).count())
      val ss = time(s"simhash_star")(DedupOps.simhashStarEdges(spark, dir).count())
      val mp = time(s"minhash_pairs")(
        DedupOps.minhashPairs(spark, dir, planted = false).count())
      println(s"edges: minhash_star=$ms simhash_star=$ss minhash_pairs=$mp")
    }
    spark.stop()
  }
}
