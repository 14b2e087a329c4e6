package graft.tools
import graft.{Engine, GoldenRunner}
/** Reports pass/fail per golden case without failing (triage tool). */
object GoldenCheck {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    val sf = "/root/testdata/sf0.001"
    try {
      var ok = 0; var bad = 0
      for (c <- GoldenRunner.parse(args(0))) {
        try GoldenRunner.run(spark, sf, c) match {
          case None => ok += 1; println(s"PASS ${c.name}")
          case Some(err) =>
            bad += 1
            println(s"FAIL ${c.name}: ${err.linesIterator.take(3).mkString(" | ").take(300)}")
        } catch { case e: Throwable =>
          bad += 1
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .linesIterator.filter(_.trim.nonEmpty).take(2).mkString(" | ")
          println(s"FAIL ${c.name}: EX ${msg.take(250)}")
        }
      }
      println(s"== $ok pass, $bad fail")
    } finally spark.stop()
  }
}
