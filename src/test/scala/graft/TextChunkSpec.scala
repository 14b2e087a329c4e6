package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RAG chunking invariants (text_chunk): stride/overlap layout,
  * full coverage, and tail behavior over the sf corpus.
  */
class TextChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = {
    Engine.configure(spark)
    SparkEntry.queries("text_chunk")(spark, TestSpark.sf)
      .as[(Long, Int, Int, Int, String)].collect().toSeq
  }

  test("starts follow the stride; last chunk reaches the final token") {
    val toks = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .as("n")).as[(Long, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, cid, start, nt, _), i) =>
        assert(cid == i && start == i * 48 + 1)
        assert(nt == math.min(64, toks(doc) - i * 48))
      }
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN - 1 == toks(doc)) // tail covered
      if (sorted.size > 1) assert(lastN > 16) // never inside the previous
    }
  }

  test("reassembling non-overlap regions reproduces the token stream") {
    val texts = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val want = texts(doc).split("\\s+").filter(_.nonEmpty).toSeq
      val got = cs.sortBy(_._2).flatMap { case (_, cid, _, _, txt) =>
        val t = txt.split(" ").toSeq
        if (cid == 0) t else t.drop(16)
      }
      assert(got == want, s"doc $doc")
    }
  }
}
