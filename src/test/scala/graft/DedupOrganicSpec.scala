package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pins for the ORGANIC (planted = false) dedup pipelines —
  * the band-join + threshold semantics the driver entries project twins
  * out of. Each pipeline must be deterministic, respect its own verify
  * threshold on every returned pair, keep doc_a < doc_b, and recover a
  * manually planted identical twin when one is unioned in (recall).
  */
class DedupOrganicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.operators.DedupOps

  test("organic minhash pairs are deterministic and pass the 0.35 bar") {
    val r1 = DedupOps.minhashPairs(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    val r2 = DedupOps.minhashPairs(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    assert(r1 === r2)
    r1.foreach { row =>
      assert(row(0).asInstanceOf[Long] < row(1).asInstanceOf[Long])
      assert(row(2).asInstanceOf[Double] >= 0.35)
    }
  }

  test("organic simhash pairs are deterministic and within Hamming 6") {
    val r1 = DedupOps.simhashPairs(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    val r2 = DedupOps.simhashPairs(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    assert(r1 === r2)
    r1.foreach { row =>
      assert(row(0).asInstanceOf[Long] < row(1).asInstanceOf[Long])
      assert(row(2).asInstanceOf[Int] <= 6)
    }
  }

  test("organic ngram-jaccard pairs are deterministic and >= 0.3") {
    val r1 = DedupOps.ngramJaccardPairs(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    val r2 = DedupOps.ngramJaccardPairs(spark, TestSpark.sf, planted = false)
      .collect().map(_.toSeq).toSeq
    assert(r1 === r2)
    r1.foreach { row =>
      assert(row(0).asInstanceOf[Long] < row(1).asInstanceOf[Long])
      assert(row(2).asInstanceOf[Double] >= 0.3)
    }
  }

  test("the planted driver entries recover every eligible twin (recall)") {
    // minhash/ngram twins need >= 3 tokens (word-3-gram shingles);
    // simhash twins always collide. The oracle SQL already encodes this;
    // here the property is checked engine-side without DuckDB.
    import org.apache.spark.sql.functions._
    val docs = Engine.table(spark, TestSpark.sf, "documents")
    val eligible = docs
      .filter(col("doc_id") % 20 === 0)
      .filter(size(split(trim(col("text")), "\\s+")) >= 3)
      .count()
    val mh = SparkEntry.queries("dedup_minhash")(spark, TestSpark.sf).count()
    val ng = SparkEntry.queries("dedup_ngram_jaccard")(spark, TestSpark.sf).count()
    val sh = SparkEntry.queries("dedup_simhash")(spark, TestSpark.sf).count()
    val twinsAll = docs.filter(col("doc_id") % 20 === 0).count()
    assert(mh == eligible, s"minhash recovered $mh of $eligible twins")
    assert(ng == eligible, s"ngram recovered $ng of $eligible twins")
    assert(sh == twinsAll, s"simhash recovered $sh of $twinsAll twins")
  }
}
