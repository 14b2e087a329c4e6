package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for text_boilerplate (cross-document 8-gram span
  * removal): planted shared spans disappear from every carrier, unique
  * content survives untouched, and full coverage empties the text.
  */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scrub(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bp_spec").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // satisfy Engine.register's full table set with empty copies
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings")) {
      val src = s"${TestSpark.sf}/$t.parquet"
      spark.read.parquet(src).limit(0).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    graft.operators.TextOps.boilerplate.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
  }

  private val span = (1 to 8).map(i => s"w$i").mkString(" ")

  test("a span shared by two docs is removed from both; unique tails survive") {
    val out = scrub(Seq(
      1L -> s"alpha beta $span gamma delta",
      2L -> s"$span epsilon zeta",
      3L -> "totally unique words that repeat nowhere else at all ok"))
    assert(out(1L) == ((12, 8, "alpha beta gamma delta")))
    assert(out(2L) == ((10, 8, "epsilon zeta")))
    assert(out(3L)._2 == 0 && out(3L)._3.startsWith("totally unique"))
  }

  test("overlapping frequent spans union their covered positions") {
    // 9 shared words = two overlapping 8-gram spans; all 9 positions go
    val nine = (1 to 9).map(i => s"w$i").mkString(" ")
    val out = scrub(Seq(
      1L -> s"$nine keep1",
      2L -> s"$nine keep2"))
    assert(out(1L) == ((10, 9, "keep1")))
    assert(out(2L) == ((10, 9, "keep2")))
  }

  test("full coverage empties the text; short docs are never spanned") {
    val out = scrub(Seq(
      1L -> span, 2L -> span, // fully boilerplate
      3L -> "short doc under eight words here")) // 6 words, no 8-gram
    assert(out(1L) == ((8, 8, "")))
    assert(out(2L) == ((8, 8, "")))
    assert(out(3L) == ((6, 0, "short doc under eight words here")))
  }

  test("span<->freq join is size-chosen, never a forced broadcast") {
    // the frequent-span set is UNBOUNDED above (df >= 2 is a lower
    // bound; a template-heavy crawl can duplicate every span), so the
    // plan must not carry a broadcast hint — AQE may still broadcast at
    // small SFs, but the choice has to be size-based, not forced
    val df = graft.operators.TextOps.boilerplate.run(spark, TestSpark.sf)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), analyzed)
    assert(!analyzed.contains("UnresolvedHint"), analyzed)
    // both join inputs derive from the same exploded span stream; the
    // optimized plan keeps the equi-join on the span key
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("span"), opt)
  }

  test("a span repeated within ONE doc only is not boilerplate (df counts docs)") {
    val out = scrub(Seq(
      1L -> s"$span middle $span",
      2L -> "other words entirely different from the first document text"))
    assert(out(1L)._2 == 0, out(1L).toString)
  }
}
