package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Substring-level exact dedup (DedupOps.substringSpans): winnowed
  * fingerprints + anchor extension must equal the full-index
  * per-diagonal islands semantics the DuckDB oracle computes.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference: all maximal per-diagonal common runs of
    * length >= minSpan between every doc pair (doc_a < doc_b), 1-based.
    */
  private def bruteSpans(docs: Seq[(Long, String)],
      minSpan: Int): Set[(Long, Long, Int, Int, Int)] = {
    val out = scala.collection.mutable.Set[(Long, Long, Int, Int, Int)]()
    for {
      (ida, ta) <- docs
      (idb, tb) <- docs
      if ida < idb
      delta <- -(ta.length - 1) to (tb.length - 1)
    } {
      // walk the diagonal pa -> pb = pa + delta, collect maximal runs
      var pa = math.max(0, -delta)
      val paEnd = math.min(ta.length, tb.length - delta)
      while (pa < paEnd) {
        if (ta(pa) == tb(pa + delta)) {
          val start = pa
          while (pa < paEnd && ta(pa) == tb(pa + delta)) pa += 1
          val len = pa - start
          if (len >= minSpan) {
            out += ((ida, idb, start + 1, start + delta + 1, len))
          }
        } else pa += 1
      }
    }
    out.toSet
  }

  private def gotSpans(docs: Seq[(Long, String)], k: Int, w: Int,
      minSpan: Int): Set[(Long, Long, Int, Int, Int)] = {
    Engine.configure(spark)
    DedupOps.substringSpans(docs.toDF("doc_id", "text"), k, w, minSpan)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
  }

  test("hand-built corpus: winnowed spans == brute-force diagonal runs") {
    val shared = "The quick brown fox jumps over the lazy dog near the river bank today."
    val docs = Seq(
      1L -> s"alpha prefix text. $shared And then doc one trails off differently.",
      2L -> s"completely different opening here!! $shared doc two ends another way.",
      3L -> "no overlap with anything else at all — short and unique text body.",
      // doc 4 shares a DIFFERENT span with doc 1's tail
      4L -> "And then doc one trails off differently. Plus extra unique doc four content here to pad.")
    for ((k, w, minSpan) <- Seq((40, 12, 60), (20, 6, 30), (10, 4, 15))) {
      val got = gotSpans(docs, k, w, minSpan)
      val want = bruteSpans(docs, minSpan)
      assert(got === want, s"k=$k w=$w minSpan=$minSpan")
      assert(want.nonEmpty)
    }
  }

  test("internal repetition: one span per diagonal, like the full index") {
    // "ab"*30 vs "ab"*25: every even delta gives a distinct maximal run —
    // the island semantics reports each diagonal separately
    val docs = Seq(1L -> ("ab" * 30 + "XXX"), 2L -> ("YY" + "ab" * 25))
    val got = gotSpans(docs, k = 8, w = 3, minSpan = 10)
    val want = bruteSpans(docs, minSpan = 10)
    assert(got === want)
    assert(want.size > 5) // genuinely multi-diagonal
  }

  test("winnowed w=12 equals full-index w=1 on the planted sf corpus") {
    Engine.configure(spark)
    val base = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("Z#"), substring(col("text"), 8, 250), lit("#Q"))
          .as("text"))
    val corpus = base.unionByName(planted)
    def rows(w: Int) =
      DedupOps.substringSpans(corpus, k = 40, w = w, minSpan = 60)
        .as[(Long, Long, Int, Int, Int)].collect().toSet
    val winnowed = rows(12)
    val full = rows(1)
    assert(winnowed === full)
    assert(full.nonEmpty)
  }

  test("planted twins: exact span (a_start=8, b_start=3, len=min(250, n-7))") {
    Engine.configure(spark)
    val got = SparkEntry.queries("dedup_substring")(spark, TestSpark.sf)
      .as[(Long, Long, Int, Int, Int)].collect()
    val twins = got.filter { case (a, b, _, _, _) => b == a + 10000000L }
      .map { case (a, _, s, bs, l) => (a, s, bs, l) }.toSet
    val lens = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("int"))
      .as[(Long, Int)].collect().toMap
    val want = lens.collect {
      case (id, n) if id % 10 == 0 && math.min(250, n - 7) >= 60 =>
        (id, 8, 3, math.min(250, n - 7))
    }.toSet
    assert(twins === want)
    assert(want.size >= 40)
  }

  /** Reference span removal: merge the doc_b-side intervals of
    * bruteSpans and cut them with plain string ops.
    */
  private def refCut(docs: Seq[(Long, String)],
      minSpan: Int): Map[Long, (Int, Int, String)] = {
    val byDoc = bruteSpans(docs, minSpan).toSeq
      .map { case (_, b, _, bs, l) => (b, (bs, bs + l)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(identity)).toMap
    docs.map { case (id, text) =>
      val merged = byDoc.getOrElse(id, Seq.empty)
        .foldLeft(List.empty[(Int, Int)]) {
          case (acc, (s, e)) => acc match {
            case (ps, pe) :: rest if s <= pe =>
              (ps, math.max(pe, e)) :: rest
            case _ => (s, e) :: acc
          }
        }.reverse
      val sb = new StringBuilder
      var cursor = 1
      merged.foreach { case (s, e) =>
        sb.append(text.substring(cursor - 1, s - 1)); cursor = e
      }
      sb.append(text.substring(cursor - 1))
      id -> (merged.size, merged.map { case (s, e) => e - s }.sum,
        sb.toString)
    }.toMap
  }

  test("span removal: cut == reference interval-merge-and-cut, fully-contained doc empties") {
    Engine.configure(spark)
    val shared = "The quick brown fox jumps over the lazy dog near the river bank today."
    val docs = Seq(
      1L -> s"alpha prefix text. $shared And then doc one trails off in its own way.",
      2L -> s"intro two!! $shared middle bit. $shared outro two.",
      3L -> shared, // fully contained in 1 and 2 -> cut to empty
      4L -> "no overlap with anything else at all — short and unique text body.")
    val got = DedupOps.substringCut(docs.toDF("doc_id", "text"),
        k = 20, w = 6, minSpan = 30)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2.toInt, r._3.toInt, r._4)).toMap
    val want = refCut(docs, minSpan = 30)
    assert(got === want)
    assert(got(3L)._3 === "") // doc 3 is a pure duplicate: nothing survives
    assert(got(1L) === ((0, 0, docs.head._2))) // smallest id keeps everything
  }

  test("docs shorter than k produce no fingerprints and no crash") {
    val docs = Seq(1L -> "tiny", 2L -> "tiny", 3L -> "")
    assert(gotSpans(docs, k = 40, w = 12, minSpan = 60).isEmpty)
  }

  test("winnow_grams: w=1 selects every position; winnowed is a subset with bounded gaps") {
    Engine.configure(spark)
    val text = "The quick brown fox jumps over the lazy dog repeatedly and then some more text."
    def sel(w: Int): Seq[(Int, Long)] = spark.range(1)
      .select(explode(call_function("winnow_grams", lit(text), lit(10),
        lit(w))).as("fp"))
      .select(col("fp.pos"), col("fp.h")).as[(Int, Long)].collect().toSeq
    val full = sel(1)
    assert(full.map(_._1) === (1 to (text.length - 9)))
    val win = sel(4)
    val fullMap = full.toMap
    assert(win.forall { case (p, h) => fullMap(p) == h })
    // winnowing guarantee: every window of 4 consecutive positions has a pick
    val picks = win.map(_._1).toSet
    assert((1 to (text.length - 9 - 3)).forall(i =>
      (i until i + 4).exists(picks.contains)))
  }

  test("extend_spans char-verifies anchors: a bogus anchor yields no span") {
    Engine.configure(spark)
    val got = spark.range(1)
      .select(explode(call_function("extend_spans",
        lit("abcdefgh"), lit("zzzzzzzz"),
        array(struct(lit(3).as("pa"), lit(3).as("pb"))))).as("sp"))
      .collect()
    assert(got.isEmpty)
  }
}
