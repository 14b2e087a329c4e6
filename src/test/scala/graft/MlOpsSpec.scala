package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MlOps

/** Pins for the distributed ML primitives (MlOps): full-corpus Lloyd's,
  * SemDeDup, and the hashed-feature linear probe.
  */
class MlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def emb: DataFrame = Engine.table(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private val Scale = 9007199254740992.0 // 2^53

  /** Sequential Lloyd's with the EXACT arithmetic kmeansFit promises:
    * cell keys |c|^2 - 2 x.c as index-order folds with first-min-index
    * ties, component sums as exact integers of v * 2^53 (BigDecimal),
    * centroid = (sum / 2^53) / n, empty cells keep their centroid.
    */
  private def referenceLloyd(xs: Array[Array[Float]], k: Int,
      iters: Int): Array[Array[Double]] = {
    var cents = xs.take(k).map(_.map(_.toDouble))
    val dim = cents(0).length
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length, dim)(BigDecimal(0))
      val counts = new Array[Long](cents.length)
      val norms = cents.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i) * c(i); i += 1 }
        s
      }
      xs.foreach { v =>
        var best = 0; var bestK = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var acc = 0.0; var i = 0
          while (i < dim) { acc += v(i).toDouble * cents(c)(i); i += 1 }
          val key = norms(c) - 2.0 * acc
          if (key < bestK) { bestK = key; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) {
          sums(best)(i) += BigDecimal(v(i).toDouble * Scale)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP)
          i += 1
        }
        counts(best) += 1
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else Array.tabulate(dim)(i => (sums(c)(i).toDouble / Scale) / counts(c))
      }
    }
    cents
  }

  test("distributed kmeansFit equals the sequential reference bit-for-bit") {
    val xs = emb.orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val expect = referenceLloyd(xs, k = 10, iters = 4)
    val got = MlOps.kmeansFit(emb, "vec_id", "embedding", k = 10, iters = 4)
    assert(got.length == expect.length)
    got.zip(expect).zipWithIndex.foreach { case ((g, e), c) =>
      assert(g.sameElements(e), s"centroid $c diverges")
    }
  }

  test("kmeansFit is independent of input partitioning (exact sums)") {
    val a = MlOps.kmeansFit(emb.repartition(3), "vec_id", "embedding", 8, 3)
    val b = MlOps.kmeansFit(emb.repartition(17), "vec_id", "embedding", 8, 3)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("kmeansFit recovers planted well-separated clusters") {
    import spark.implicits._
    // 4 centers on distinct axes, 40 points each with deterministic
    // small jitter; ids interleave the clusters so init picks 4
    // DIFFERENT-cluster seeds only by luck of separation after 5 iters
    val pts = (0 until 160).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 10.0f
      val jit = Array.tabulate(8)(j => ((i * 31 + j * 7) % 11 - 5) * 0.05f)
      (i.toLong, base.zip(jit).map { case (x, y) => x + y }.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val cents = MlOps.kmeansFit(df, "vec_id", "embedding", k = 4, iters = 5)
    val assigned = MlOps.assignCells(df, "embedding", cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // every cluster (i % 4) maps to exactly one cell, and cells differ
    val byTruth = assigned.groupBy(_._1 % 4).map { case (t, rows) =>
      t -> rows.map(_._2).distinct
    }
    assert(byTruth.values.forall(_.length == 1), s"impure clusters: $byTruth")
    assert(byTruth.values.flatten.toSeq.distinct.length == 4)
    // centroids sit near the planted centers
    cents.foreach { c =>
      val hot = c.indexWhere(math.abs(_) > 5.0)
      assert(hot >= 0 && math.abs(c(hot) - 10.0) < 0.2)
    }
  }

  test("kmeansFit keeps empty cells at their init centroid") {
    import spark.implicits._
    // 2 tight clusters but k = 3: the third seed (id 2) belongs to
    // cluster 0's blob, loses all members by iter 2, and must retain
    // its previous centroid rather than collapse to NaN
    val pts = (0 until 40).map { i =>
      val c = i % 2
      (i.toLong, Seq.tabulate(4)(j =>
        (if (j == c) 10.0f else 0.0f) + (i % 5) * 0.01f))
    }
    val df = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val cents = MlOps.kmeansFit(df, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.length == 3)
    assert(cents.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }

  test("coarse triangle-pruned assignment == flat scan, organically " +
    "and at adversarial k") {
    Engine.configure(spark)
    // organic: the sf corpus at a k where coarse pruning is active
    val cents = MlOps.kmeansFit(emb, "vec_id", "embedding", k = 32,
      iters = 2)
    val flat = MlOps.assignCells(emb, "embedding", cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val coarse = MlOps.assignCellsCoarse(emb, "embedding", cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(coarse == flat, "coarse assignment diverged on the sf corpus")
    // adversarial: centroid TIES (duplicated centroids — the argmin
    // must still be the FIRST index) and near-boundary vectors
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val k = 300
    val dupCents = Array.tabulate(k)(i =>
      Array.tabulate(8)(j => ((i / 2) * 31 + j * 7 % 13).toDouble / 7.0))
    val vecs = Seq.tabulate(1500)(i =>
      (i.toLong, Array.tabulate(8)(j =>
        (rnd.nextDouble() * 60.0).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val f2 = MlOps.assignCells(vecs, "embedding", dupCents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val c2 = MlOps.assignCellsCoarse(vecs, "embedding", dupCents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(c2 == f2, "coarse assignment diverged under duplicate-centroid ties")
  }

  test("semanticDedup drops within-cluster near-dups, keeps min id") {
    import spark.implicits._
    // identical triple (ids 5, 6, 7) + two isolated vectors
    val v = Seq(1.0f, 2.0f, 3.0f, 4.0f)
    val pts = Seq(
      (0L, Seq(10.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 10.0f, 0.0f, 0.0f)),
      (5L, v), (6L, v), (7L, v))
    val df = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val cents = Array(Array(10.0, 0, 0, 0), Array(0.0, 10, 0, 0),
      Array(1.0, 2, 3, 4))
    val out = MlOps.semanticDedup(df, "vec_id", "embedding", cents, 0.64)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    assert(out.sameElements(Array(0L, 1L, 5L)),
      s"expected triple collapsed to min id, got ${out.mkString(",")}")
  }

  test("semanticDedup recall boundary: near-dups split by the cell " +
    "bisector are NOT deduped (clustering is the blocking)") {
    import spark.implicits._
    // v1/v2 have cosine ~1 but straddle the c0/c1 bisector, landing in
    // different cells — SemDeDup's documented recall trade (the pair
    // stage only sees within-cluster mates)
    val pts = Seq(
      (0L, Seq(1.001f, 1.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 1.001f, 0.0f, 0.0f)))
    val df = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val cents = Array(Array(1.0, 0, 0, 0), Array(0.0, 1, 0, 0))
    val out = MlOps.semanticDedup(df, "vec_id", "embedding", cents, 0.64)
    assert(out.count() == 2)
    // same pair, one cell -> deduped
    val one = MlOps.semanticDedup(df, "vec_id", "embedding",
      Array(Array(1.0, 1, 0, 0)), 0.64)
    assert(one.count() == 1)
  }

  test("gramStats equals an in-memory integer reference") {
    val docs = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val got = MlOps.gramStats(docs).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // reference: hash features in plain Scala
    val raw = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val hex = "0123456789abcdef"
    def bucket(w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val h = md.map("%02x".format(_)).mkString
      ((hex.indexOf(h(0))) * 16 + hex.indexOf(h(1))) % 32
    }
    val feats = raw.map { case (id, text) =>
      val counts = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(bucket).map { case (b, ws) => b -> ws.length.toLong }
      id -> (counts + (32 -> 1L))
    }.toMap
    val labels = feats.map { case (id, f) =>
      id -> (if (f.getOrElse(13, 0L) > f.getOrElse(28, 0L)) 1L else -1L)
    }
    val expect = collection.mutable.Map[(Int, Int), Long]()
    feats.foreach { case (id, f) =>
      for ((i, ci) <- f; (j, cj) <- f if i <= j)
        expect((i, j)) = expect.getOrElse((i, j), 0L) + ci * cj
      for ((i, ci) <- f)
        expect((i, -1)) = expect.getOrElse((i, -1), 0L) + ci * labels(id)
    }
    assert(got == expect.toMap)
  }

  test("full-F probe (lsqFit + probeScore) recovers the teacher rule") {
    val docs = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val gram = MlOps.gramStats(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val w = MlOps.lsqFit(gram)
    val scored = MlOps.probeScore(docs, w)
    // teacher labels via the oracle entry's own pred would be circular;
    // recompute labels from raw text
    val preds = scored.select(col("doc_id"), col("pred")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val raw = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = raw.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> (if (toks.count(_ == "data") > toks.count(_ == "key")) 1 else -1)
    }.toMap
    val acc = truth.count { case (id, y) => preds(id) == y }.toDouble /
      truth.size
    assert(acc >= 0.90, s"probe accuracy $acc below floor")
  }

  test("3-feature Cramer scoring entry recovers the teacher rule") {
    val out = SparkEntry.queries("quality_lsq_score")(spark, sf)
      .select(col("doc_id"), col("pred")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val raw = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val truth = raw.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> (if (toks.count(_ == "data") > toks.count(_ == "key")) 1 else -1)
    }.toMap
    val acc = truth.count { case (id, y) => out(id) == y }.toDouble /
      truth.size
    assert(acc >= 0.95, s"Cramer probe accuracy $acc below floor")
  }
}
