package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Distributed BPE trainer/encoder vs an independent sequential
  * reference implementation (plain Scala maps, no Spark).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference: word counts -> (rank, left, right, count)
    * merge list, canonical semantics — per-position pair stats
    * (overlaps counted), argmax by (count DESC, left ASC, right ASC),
    * leftmost-first non-overlapping rewrite.
    */
  private def refTrain(texts: Seq[String],
      nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view
      .map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
      .toMap
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var continue = true
    while (rank <= nMerges && continue) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((rank, l, r, l + r, n))
        words = words.toSeq.map { case (syms, cnt) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), cnt)
        }.groupBy(_._1).view.map { case (k, v) => k -> v.map(_._2).sum }.toMap
        rank += 1
      }
    }
    out.toSeq
  }

  private def gotTrain(texts: Seq[String],
      nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    Engine.configure(spark)
    CorpusOps.bpeTrain(texts.toDF("text"), nMerges)
      .orderBy(col("rank"))
      .as[(Int, String, String, String, Long)].collect().toSeq
  }

  test("hand corpus with overlap runs: trainer == sequential reference") {
    // 'aaaa'/'aaa' force an (a,a) merge with overlapping positions —
    // counted per position, applied leftmost-first non-overlapping
    val texts = Seq("aaaa aaa bb aaaa", "low lower lowest low low",
      "bb aaa bb newer newest new")
    for (n <- Seq(1, 4, 12)) {
      assert(gotTrain(texts, n) === refTrain(texts, n), s"nMerges=$n")
    }
  }

  test("merge exhaustion: trainer stops early when no pairs remain") {
    val texts = Seq("ab ab ab a b")
    val got = gotTrain(texts, 10)
    assert(got === refTrain(texts, 10))
    assert(got.size < 10 && got.head._4 == "ab")
  }

  test("sf corpus: 16 trained merges == sequential reference") {
    Engine.configure(spark)
    val texts = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("text")).as[String].collect().toSeq
    assert(gotTrain(texts, 16) === refTrain(texts, 16))
  }

  test("delta-maintained pair stats stay exact deep into training " +
    "(48 merges vs sequential full recount)") {
    // 48 rounds exercise the incremental pair-count maintenance far
    // past the first-order merges: merged symbols re-pair with
    // neighbors, counts decay to zero and must drop out, and ties are
    // broken on maintained (not recounted) statistics — any drift in
    // the delta update diverges the argmax somewhere in 48 rounds.
    Engine.configure(spark)
    val texts = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("text")).as[String].collect().toSeq
    assert(gotTrain(texts, 48) === refTrain(texts, 48))
  }

  test("encode kernel replays training: kernel tokens == final vocab tokens") {
    Engine.configure(spark)
    val docs = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("text"))
    val (merges, vocab) = CorpusOps.bpeTrainWithVocab(docs, 16)
    val packed = graft.functions.BpeKernels.packMerges(
      merges.orderBy(col("rank")).select(col("left"), col("right"))
        .as[(String, String)].collect().toSeq)
    val mismatches = vocab
      .select(col("w"), col("syms"),
        call_function("bpe_encode", col("w"), lit(packed)).as("enc"))
      .filter(col("syms") =!= col("enc"))
      .count()
    assert(mismatches === 0)
  }

  test("encode handles words unseen in training") {
    Engine.configure(spark)
    val packed = graft.functions.BpeKernels.packMerges(
      Seq(("l", "o"), ("lo", "w")))
    val got = spark.range(1)
      .select(call_function("bpe_encode", lit("lowlyplow"), lit(packed)))
      .as[Seq[String]].collect().head
    assert(got === Seq("low", "l", "y", "p", "low"))
  }

  test("bpe_apply merges leftmost-first, non-overlapping") {
    Engine.configure(spark)
    val got = spark.range(1)
      .select(call_function("bpe_apply",
        split(lit("aaa"), ""), lit("a"), lit("a")))
      .as[Seq[String]].collect().head
    assert(got === Seq("aa", "a"))
  }
}
