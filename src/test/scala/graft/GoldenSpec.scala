package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes every golden .test file under src/test/resources/golden
  * (QueryTest format, SURVEY.md section 5) against sf0.001.
  */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = new java.io.File(
    getClass.getClassLoader.getResource("golden").toURI)

  for {
    f <- dir.listFiles().toSeq.sortBy(_.getName) if f.getName.endsWith(".test")
    c <- GoldenRunner.parse(f.getPath)
  } test(c.name) {
    GoldenRunner.run(spark, TestSpark.sf, c).foreach(err => fail(err))
  }
}
