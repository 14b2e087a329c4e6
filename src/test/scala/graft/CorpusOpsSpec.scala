package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-construction operators: decontamination, packing, stratified
  * sampling, term stats. Oracle equivalence is the t2 gate's job; these
  * pin the semantic invariants the oracle can't express.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("decontaminate: sentinel-seeded docs flagged, variant-1 clean") {
    val rows = run("decontaminate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val byId = rows.toMap
    // benchmark docs (doc_id % 97 == 0) are excluded from the output
    assert(rows.forall(_._1 % 97 != 0))
    // seeded docs (% 13 == 0) with variant doc_id % 9 in 0..6 share a
    // sentinel 8-gram with every benchmark doc; variants 7 and 8 don't
    val seeded = rows.map(_._1).filter(id => id % 13 == 0)
    assert(seeded.nonEmpty)
    seeded.foreach { id =>
      val (hits, flagged) = byId(id)
      if (id % 9 <= 6) {
        assert(flagged && hits >= 1, s"doc $id variant ${id % 9} should hit")
      } else {
        assert(!flagged, s"doc $id variant ${id % 9} has no benchmark twin")
      }
    }
    // unseeded flagged docs must have a GENUINE 8-gram overlap with a
    // benchmark doc (the corpus plants duplicate texts) — re-derive the
    // shingle sets independently in plain Scala and cross-check
    def grams(text: String): Set[String] = {
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 8) Set.empty
      else tk.sliding(8).map(_.mkString(" ")).toSet
    }
    val texts = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val benchGrams = texts.collect {
      case (id, tx) if id % 97 == 0 => grams(tx)
    }.fold(Set.empty)(_ ++ _)
    rows.foreach { case (id, (_, flagged)) =>
      if (id % 13 != 0) {
        val organic = grams(texts(id)).intersect(benchGrams).nonEmpty
        assert(flagged === organic, s"doc $id organic=$organic")
      }
    }
  }

  test("pack_sequences: bins cover every doc exactly once, in order") {
    val docs = Engine.table(spark, TestSpark.sf, "documents")
    val n = docs.count()
    val bins = run("pack_sequences").collect()
    assert(bins.map(_.getAs[Long]("n_docs")).sum === n)
    // per source: bin ids contiguous from 0, doc ranges non-overlapping
    bins.groupBy(_.getString(0)).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("bin_id"))
      assert(sorted.map(_.getAs[Long]("bin_id")).toSeq ===
        (0L until sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
      // every bin but the last was closed because it reached the budget:
      // its tokens plus the next doc's first token count would overflow —
      // equivalently each non-final bin's cumulative start is bin_id*2048
      // and bin_tokens straddles into the next multiple
      val cum = sorted.scanLeft(0L)(_ + _.getAs[Long]("bin_tokens")).tail
      sorted.init.zip(cum.init).foreach { case (bin, cumEnd) =>
        assert(cumEnd > (bin.getAs[Long]("bin_id") + 1) * 2048 - 1,
          s"non-final bin ${bin.getAs[Long]("bin_id")} closed early")
      }
    }
  }

  test("sample_stratified: exact hash population per stratum") {
    val doc = Engine.table(spark, TestSpark.sf, "documents")
    val kept = run("sample_stratified").collect()
    val keptIds = kept.map(_.getLong(0)).toSet
    val thresholds = Map("en" -> "40", "es" -> "80", "de" -> "cc",
      "fr" -> "ff", "zh" -> "20")
    // membership is exactly the hash rule — re-derive it independently
    doc.select(col("doc_id"), col("lang")).collect().foreach { r =>
      val id = r.getLong(0); val lang = r.getString(1)
      val bucket = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      val expected = bucket < thresholds.getOrElse(lang, "20")
      assert(keptIds.contains(id) === expected, s"doc $id lang $lang")
    }
    // fr keeps everything ('ff' threshold only drops bucket "ff")
    val frTotal = doc.filter(col("lang") === "fr").count()
    val frKept = kept.count(_.getString(1) == "fr")
    assert(frKept >= frTotal - frTotal / 8)
  }

  test("sample_mixture: data-derived thresholds, rarest source keeps all, corpus never shuffles") {
    val doc = Engine.table(spark, TestSpark.sf, "documents")
    val counts = doc.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    // thresholds re-derived independently: floor(256 * sqrt(n_min/n_s))
    val thr = counts.map { case (l, n) =>
      l -> math.floor(256 * math.sqrt(nMin.toDouble / n)).toInt
    }
    val df = SparkEntry.queries("sample_mixture")(spark, TestSpark.sf)
    val kept = df.collect()
    kept.foreach { r =>
      assert(r.getInt(2) === thr(r.getString(1)),
        s"threshold mismatch for ${r.getString(1)}")
    }
    // the rarest source's threshold is 256: nothing of it is dropped
    val rarest = counts.minBy(_._2)._1
    assert(thr(rarest) === 256)
    assert(kept.count(_.getString(1) == rarest) === counts(rarest))
    // dominant sources downsample: at least one threshold < 256
    assert(thr.values.min < 256)
    // membership is exactly the hash rule, re-derived independently
    val keptIds = kept.map(_.getLong(0)).toSet
    doc.select(col("doc_id"), col("lang")).collect().foreach { r =>
      val id = r.getLong(0); val t = thr(r.getString(1))
      val bucket = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      val expected = t >= 256 || bucket < "%02x".format(t)
      assert(keptIds.contains(id) === expected, s"doc $id")
    }
    // scale shape: the corpus-side plan has exactly the tiny count agg's
    // exchanges — the keep-filter joins via broadcast, never a corpus
    // shuffle (AQE final plan after execution)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("sample_token_budget: kept tokens fit the budget maximally, bucket-granular") {
    val budget = 2000L
    val rows = SparkEntry.queries("sample_token_budget")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_._2)
    // full corpus histogram re-derived independently
    val doc = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("lang"),
        size(filter(split(col("text"), "\\s+"), x => x =!= "")).as("ntok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val hist = doc.groupBy(d => (d._2,
      java.security.MessageDigest.getInstance("MD5")
        .digest(d._1.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString))
      .view.mapValues(_.map(_._3.toLong).sum).toMap
    byLang.foreach { case (lang, kept) =>
      val total = kept.map(_._4.toLong).sum
      assert(total <= budget, s"$lang kept $total > $budget")
      // maximality: the next bucket would have burst the budget
      val cutoff = kept.map(_._3).max
      val next = hist.keys.filter(k => k._1 == lang && k._2 > cutoff)
        .toSeq.sortBy(_._2).headOption
      next.foreach { nb =>
        assert(total + hist(nb) > budget,
          s"$lang cutoff $cutoff not maximal: next bucket ${nb._2} fits")
      }
    }
  }

  test("text_tfidf: 15 rows per lang, idf-monotone, deterministic") {
    val rows = run("text_tfidf").collect()
    val langs = rows.map(_.getString(0)).distinct
    assert(langs.length >= 3)
    langs.foreach { l =>
      val lr = rows.filter(_.getString(0) == l)
      assert(lr.length === 15)
      // tfidf_ppm = tf * (n_docs*1e6 div df): rarer terms (smaller df)
      // score higher at equal tf
      lr.groupBy(_.getAs[Long]("tf")).values.foreach { g =>
        val byDf = g.sortBy(_.getAs[Long]("df"))
        assert(byDf.map(_.getAs[Long]("tfidf_ppm")).reverse.sorted.sameElements(
          byDf.map(_.getAs[Long]("tfidf_ppm")).reverse))
      }
    }
    // stable across runs (pure function of the data)
    val again = run("text_tfidf").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("sample_priority: DLT selection, threshold and estimator are " +
    "exact and partitioning-independent") {
    import graft.operators.CorpusOps
    val docs = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("w"))
    val n = docs.count()
    val k = 100
    // in-memory reference of the full scheme
    val M = 2147483647L
    val wById = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pri(id: Long, w: Long): Double = {
      val r = ((id % (M - 1)) + 1) * 48271L % M * 48271L % M * 48271L % M
      w.toDouble * M.toDouble / r.toDouble
    }
    val ranked = wById.toSeq
      .map { case (id, w) => (id, w, pri(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val expTau = if (n < k + 1) 0.0 else ranked(k)._3
    val expSel = ranked.take(k).map(t => t._1 -> t._2).toMap

    val got = run("sample_priority").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == math.min(n, k).toInt)
    assert(got.map(g => g._1 -> g._2).toMap == expSel,
      "selected set diverges from the top-k priorities")
    got.foreach { case (id, w, p, est) =>
      assert(p == pri(id, w), s"priority of $id")
      assert(est == math.max(w.toDouble, expTau), s"estimator of $id")
      // every kept item's priority clears the threshold
      assert(p >= expTau, s"priority below tau for $id")
    }
    // DLT unbiasedness sanity on this single draw: the estimator total
    // should be in the neighbourhood of the true corpus weight
    val trueSum = wById.values.sum.toDouble
    val estSum = got.map(_._4).sum
    assert(estSum > trueSum * 0.5 && estSum < trueSum * 2.0,
      s"estimator total $estSum vs true $trueSum")
    // pure function of the data: identical after a repartition
    val again = CorpusOps.prioritySample(docs.repartition(13), "doc_id",
      "w", k).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(again.sameElements(got), "result depends on partitioning")
  }

  test("sample_priority_grouped: per-stratum top-k, per-group tau, " +
    "partitioning-independent") {
    import graft.operators.CorpusOps
    val docs = Engine.table(spark, TestSpark.sf, "documents")
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("w"))
    val k = 40
    val M = 2147483647L
    def pri(id: Long, w: Long): Double = {
      val r = ((id % (M - 1)) + 1) * 48271L % M * 48271L % M * 48271L % M
      w.toDouble * M.toDouble / r.toDouble
    }
    val ref = docs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        val ranked = rows.map { case (_, id, w) => (id, w, pri(id, w)) }
          .sortBy { case (id, _, p) => (-p, id) }
        val tau = if (ranked.length < k + 1) 0.0 else ranked(k)._3
        ranked.take(k).map { case (id, w, p) =>
          (src, id) -> (w, p, math.max(w.toDouble, tau))
        }
      }.toMap
    val got = run("sample_priority_grouped").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == ref, "grouped DLT sample diverges from the reference")
    // stable under repartition
    val again = CorpusOps.prioritySampleGrouped(docs.repartition(17),
      "source", "doc_id", "w", k).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(again == got)
  }
}
