package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad: does Dataset.localCheckpoint preserve the
  * partitioning/ordering of an explicit repartition in this Spark
  * build, and under which AQE settings? Drives the prLoop/cc
  * exchange-once-then-iterate contract.
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("8")
    import spark.implicits._
    def probe(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      val lr = df.queryExecution.optimizedPlan
      println(s"== $tag logical: $lr")
      val joined = df.groupBy("k").count()
      val plan = joined.queryExecution.executedPlan
      val nEx = plan.toString.split("\n").count(l =>
        l.contains("Exchange") && !l.contains("Broadcast"))
      println(s"== $tag join exchanges=$nEx")
      joined.collect()
      val fin = joined.queryExecution.executedPlan.toString
      val nEx2 = fin.split("\n").count(l =>
        l.contains("Exchange") && !l.contains("Broadcast"))
      println(s"== $tag post-exec exchanges=$nEx2")
    }
    val base = spark.range(100000)
      .select((col("id") % 1000).as("k"), col("id").as("v"))
    probe("plain ckpt") {
      base.repartition(col("k")).sortWithinPartitions("k").localCheckpoint()
    }
    probe("aqe off ckpt") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val d = base.repartition(col("k")).sortWithinPartitions("k")
        .localCheckpoint()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      d
    }
    probe("coalesce-off ckpt") {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val d = base.repartition(col("k")).sortWithinPartitions("k")
        .localCheckpoint()
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      d
    }
    probe("double ckpt (derive AQE-on, pin AQE-off)") {
      val flat = base.localCheckpoint()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val d = flat.repartition(col("k")).sortWithinPartitions("k")
        .localCheckpoint()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      d
    }
    spark.stop()
  }
}
