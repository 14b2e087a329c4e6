package graft.tools

import graft.Engine
import graft.operators.{DedupOps, SimilarityOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratchpad: organic-path recall/pair-count measurement at a
  * given SF (round-8 threshold calibration).
  */
object OrganicProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = Engine.session("32")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val mh = time("minhash")(DedupOps.minhashPairs(spark, dir, planted = false).collect())
    val sh = time("simhash")(DedupOps.simhashPairs(spark, dir, planted = false).collect())
    val ng = time("ngram")(DedupOps.ngramJaccardPairs(spark, dir, planted = false).collect())
    println(s"pairs: minhash=${mh.length} simhash=${sh.length} ngram=${ng.length}")

    val emb = Engine.table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = emb.crossJoin(broadcast(q)).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        call_function("dot_vec", col("qe").cast("array<double>"),
          col("embedding").cast("array<double>")).as("dot"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id"))
    val brute = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = time("ivf")(SimilarityOps.ivfTopK(spark, dir, planted = false)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val pq = time("pq")(SimilarityOps.pqTopK(spark, dir, planted = false)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val lsh = time("lsh")(SimilarityOps.lshBucket(spark, dir, planted = false)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    println(s"brute=${brute.size} ivf_recall=${(ivf & brute).size.toDouble / brute.size}" +
      s" pq_recall=${(pq & brute).size.toDouble / brute.size}" +
      s" lsh_recall=${(lsh & brute).size.toDouble / brute.size}")
    spark.stop()
  }
}
