package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Engine.sql's rewrite-fallback contract: parse/analysis misses in
  * the dialect pre-pass fall back to plain spark.sql, but an engine BUG
  * in the rewrite (any other exception class) surfaces to the caller
  * instead of silently degrading the plan — a broken NestedTableRefs
  * must not run queries wrong-but-successfully.
  */
class SqlFallbackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a rewrite engine fault surfaces instead of silently degrading") {
    Engine.injectRewriteFault = true
    try {
      val e = intercept[IllegalStateException] {
        Engine.sql(spark, TestSpark.sf, "select 1").collect()
      }
      assert(e.getMessage.contains("injected rewrite fault"))
    } finally Engine.injectRewriteFault = false
  }

  test("queries still run once the fault is cleared") {
    val r = Engine.sql(spark, TestSpark.sf, "select 1 as x").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1))
  }

  test("a plain syntax error still raises the parser's error") {
    val e = intercept[Exception] {
      Engine.sql(spark, TestSpark.sf, "selectt 1").collect()
    }
    assert(e.getMessage.toLowerCase.contains("syntax"))
  }
}
