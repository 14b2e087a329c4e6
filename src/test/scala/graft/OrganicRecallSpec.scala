package graft

import graft.operators.{DedupOps, SimilarityOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Organic-path retrieval quality at sf0.1 (r7 verdict #6): the
  * planted-twin driver oracles prove plumbing; these pins prove the
  * REAL thresholds find real structure at the bench SF.
  *
  * Calibration (measured on the deterministic sf0.1 corpus, r8):
  * organic pairs minhash=256 simhash=8855 ngram=256; ANN recall@3 over
  * the 10 query vectors vs exact brute force: ivf(nprobe=2)=0.467,
  * ivf-pq(+exact re-rank)=0.367 — both far above the 2/16=0.125
  * random-cell baseline. Floors sit below the measured values so an
  * intentional parameter change has slack, but a broken band join,
  * quantizer or ADC path (which craters recall to ~0) still fails.
  * The lsh-bucket entry is excluded: at its deliberately loose tau the
  * 8-bit bucket top-3 on random vectors has no global-top-3 overlap
  * (recall 0 by design — see SimilarityOps.lshBucket's doc).
  */
class OrganicRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.1"

  private lazy val bruteTop3: Set[(Long, Long)] = {
    val emb = Engine.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        call_function("dot_vec", col("qe").cast("array<double>"),
          col("embedding").cast("array<double>")).as("dot"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val got = df.select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (got & bruteTop3).size.toDouble / bruteTop3.size
  }

  test("organic IVF (nprobe=2) recall@3 >= 0.40 at sf0.1") {
    val r = recallOf(SimilarityOps.ivfTopK(spark, dir, planted = false))
    assert(r >= 0.40, s"ivf recall $r")
  }

  test("organic IVF recall@3 is monotone over the nprobe grid {1,2,4}") {
    // the knob that buys recall with scan fraction: probing more cells
    // may only ADD candidates per query, so recall can never decrease —
    // a broken cell ranking or candidate union shows up as an inversion
    val grid = Seq(1, 2, 4).map { np =>
      np -> recallOf(SimilarityOps.ivfTopK(spark, dir, planted = false,
        nprobe = np))
    }
    info(s"nprobe recall grid: ${grid.mkString(", ")}")
    grid.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      assert(r2 >= r1, s"recall not monotone: nprobe=$n1 -> $r1, nprobe=$n2 -> $r2")
    }
    assert(grid.last._2 >= 0.40, s"nprobe=4 recall ${grid.last._2}")
  }

  test("organic IVF-PQ (ADC + exact re-rank) recall@3 >= 0.30 at sf0.1") {
    val r = recallOf(SimilarityOps.pqTopK(spark, dir, planted = false))
    assert(r >= 0.30, s"pq recall $r")
  }

  test("organic near-dup pair counts at sf0.1 are the calibrated values") {
    // exact pins: corpus and hash seeds are deterministic, so a drift
    // means the signatures, banding or thresholds changed
    assert(DedupOps.minhashPairs(spark, dir, planted = false).count() == 256)
    assert(DedupOps.simhashPairs(spark, dir, planted = false).count() == 8855)
    assert(DedupOps.ngramJaccardPairs(spark, dir, planted = false).count() == 256)
  }

  test("minhash and exact ngram-jaccard agree on the organic dup set at sf0.1") {
    // 256 == 256 above is not a coincidence: every organic pair the
    // exact inverted-index path certifies at J>=0.3 should be found by
    // 16-band minhash (collision prob at J=0.3 per band is low but the
    // corpus dups are near-identical), and vice versa
    val mh = DedupOps.minhashPairs(spark, dir, planted = false)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ng = DedupOps.ngramJaccardPairs(spark, dir, planted = false)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == ng, s"minhash-only: ${(mh -- ng).take(5)}; ngram-only: ${(ng -- mh).take(5)}")
  }
}
