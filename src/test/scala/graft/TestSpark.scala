package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("8", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
