package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point must make the dialect available
  * without any Engine call. Builds a FRESH SparkSession (sharing the
  * SparkContext) whose function registry was populated only by the
  * extension injection — Engine.register never ran on it.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the dialect surface at session build") {
    TestSpark.spark // ensure the context exists
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(prev.isEmpty || (ext ne prev.get), "expected a fresh session")
      val r = ext.sql(
        "SELECT strleft('abcdef', 3), fnv_hash('hello'), quotient(11, 3), " +
          "trunc(TIMESTAMP '2016-05-08 10:30:25', 'Q')")
        .head()
      assert(r.getString(0) === "abc")
      assert(r.getLong(1) === -6615550055289275125L)
      assert(r.getLong(2) === 3L)
      assert(r.get(3).toString.startsWith("2016-04-01"))
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
