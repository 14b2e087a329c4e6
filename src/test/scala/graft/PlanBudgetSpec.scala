package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** Standing single-scan plan gate (r9 verdict #6 / r10 #7): per-entry
  * budgets of FileSourceScan count per base table, pinned over the
  * dedup / similarity / text / corpus families. The r9 plan audits
  * found AQE exchange reuse silently fails across subtrees that differ
  * only by an inferred isnotnull join-key filter or a projection —
  * groupBy+join-back formulations then double- (or sextuple-) scan the
  * corpus, re-running tokenization/signatures per scan. These budgets
  * catch the next reuse defeat automatically instead of by hand-audit.
  *
  * Scan counts come from walking the EXECUTED adaptive plan (final
  * query stages + subqueries), not the plan string — ReusedExchange is
  * a leaf, so a reused subtree correctly counts its scans once.
  *
  * Entries whose result is a localCheckpoint (the connected-components
  * family) are out of scope: their corpus scans happen in the per-round
  * jobs, not the final plan.
  */
class PlanBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def walk(p: SparkPlan): Seq[String] = {
    val self = p match {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.toSeq
          .map(rp => rp.getName.stripSuffix(".parquet"))
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(walk) ++ p.subqueries.flatMap(walk)
  }

  private def scanCounts(df: DataFrame): Map[String, Int] = {
    df.collect() // settle the adaptive plan
    walk(df.queryExecution.executedPlan)
      .groupBy(identity).map { case (k, v) => k -> v.size }
  }

  private def check(name: String, df: DataFrame,
      budget: Map[String, Int]): String = {
    val counts = scanCounts(df)
    counts.foreach { case (table, n) =>
      val cap = budget.getOrElse(table, 0)
      assert(n <= cap,
        s"$name scans $table x$n, budget $cap — AQE reuse defeat or new scan; " +
          "raise the budget here only for a deliberate plan change")
    }
    s"$name: ${counts.toSeq.sortBy(_._1).mkString(", ")}"
  }

  /** entry -> (table -> max FileSourceScan count). The values are the
    * measured plan-audit numbers at HEAD; a deliberate plan change may
    * raise a budget, but must do so HERE, in review-visible form.
    * The planted driver entries read each base table TWICE per logical
    * use (plantTwins unions a filtered second scan), so their budgets
    * are 2x the organic path's — the organic budgets below are the
    * 100 TB-relevant ones.
    */
  private val entryBudgets: Map[String, Map[String, Int]] = Map(
    "dedup_exact" -> Map("documents" -> 1),
    // planted union (x2) x banded a/b self-join (x2)
    "dedup_minhash" -> Map("documents" -> 4),
    "dedup_simhash" -> Map("documents" -> 4),
    // one-pass inverted index (the r9 fix: was 6): a/b join over the
    // SHARED index subtree, planted union collapsed by exchange reuse
    "dedup_ngram_jaccard" -> Map("documents" -> 2),
    // shared-index a/b join (x2 via planted union) + 2 per-pair text
    // fetches (x2 each): ids-only through the shingle explosion is
    // the deliberate trade — carrying texts through it would multiply
    // text bytes by shingle count in the shuffle
    "dedup_editdist" -> Map("documents" -> 6),
    // planted union x (fingerprint a/b self-join over the shared
    // winnow subtree + 2 per-pair text fetches): ids+positions only
    // through the fingerprint shuffle, texts joined once per doc pair
    "dedup_substring" -> Map("documents" -> 6),
    // spans path (6) + the cleaned-corpus join-back (x2 planted union)
    "dedup_substring_cut" -> Map("documents" -> 8),
    // planted union x (band join ids + 2 exact-verify vector fetches)
    "dedup_embedding" -> Map("embeddings" -> 6),
    // bloom build + probe + verify-join snapshot side (planted split)
    "dedup_incremental" -> Map("documents" -> 4),
    "sim_topk_dot" -> Map("embeddings" -> 2),
    "sim_lsh_bucket" -> Map("embeddings" -> 4),
    "sim_ivf" -> Map("embeddings" -> 4),
    // codes + query side + shortlist vector re-fetch (deliberate:
    // re-fetching <= 24 vectors per query beats shuffling vectors)
    "sim_pq" -> Map("embeddings" -> 8),
    "text_quality" -> Map("documents" -> 1),
    "text_fingerprint" -> Map("documents" -> 1),
    "text_langid" -> Map("documents" -> 1),
    "text_tokens" -> Map("documents" -> 1),
    "text_pii_scrub" -> Map("documents" -> 1),
    "text_repetition" -> Map("documents" -> 2),
    "text_tfidf" -> Map("documents" -> 2),
    // one explode + two chained aggregates
    "text_gini" -> Map("documents" -> 1),
    // tf + the sf/source-count broadcast subtrees each re-tokenize
    // (exchange reuse doesn't cross the two broadcast branches);
    // production materializes the tiny tf table once
    "retrieval_distinctive_terms" -> Map("documents" -> 3),
    // size-chosen span<->freq join + the final doc join-back
    "text_boilerplate" -> Map("documents" -> 3),
    "decontaminate" -> Map("documents" -> 3),
    "pack_sequences" -> Map("documents" -> 1),
    "sample_stratified" -> Map("documents" -> 1),
    // DLT priority sampling: TopK + tau over a k+1-row localCheckpoint
    // (the checkpoint is the only corpus read); grouped = one window
    "sample_priority" -> Map("documents" -> 1),
    "sample_priority_grouped" -> Map("documents" -> 1),
    // KMV sketches: per-lang = one agg scan; overlap = ONE scan
    // building BOTH conditional sketches (the single-scan rewrite)
    "agg_kmv_ndv" -> Map("documents" -> 1),
    // per-doc projection + 1-row stats aggregate
    "retrieval_bm25" -> Map("documents" -> 2),
    // lex side (2, the bm25 shape) + the broadcast query row and the
    // dense scan
    "retrieval_hybrid_rrf" -> Map("documents" -> 2, "embeddings" -> 2),
    // all B replicates from ONE scan (explode over the kept sequence)
    "stat_bootstrap" -> Map("documents" -> 1),
    // one scan -> 2080-key aggregate with map-side combine
    "embed_covariance" -> Map("embeddings" -> 1),
    // decode+hash subtree feeds the band self-join a/b sides
    "multimodal_dhash_dedup" -> Map("documents" -> 2),
    // decode+fingerprint subtree feeds the frame-join a/b sides
    "multimodal_video_dhash" -> Map("documents" -> 2),
    "multimodal_audio_fp" -> Map("documents" -> 2),
    // operator cost is ONE snapshot scan (the anti-join left side);
    // the other six are the ORACLE HARNESS deriving the changelog
    // from the same table (3 filter branches x imperfect reuse) — a
    // production changelog is its own (small) table
    "snapshot_merge" -> Map("documents" -> 7),
    // 3 changelog branches of the oracle harness (production: one
    // changelog-table window, zero snapshot scans)
    "scd2_history" -> Map("documents" -> 3),
    // one window over the manifest
    "layout_compaction" -> Map("documents" -> 1),
    // stats aggregate + the broadcast probe side
    "events_anomaly" -> Map("events" -> 2),
    // one profile scan per snapshot (B derives from the same table)
    "quality_drift" -> Map("documents" -> 2),
    // sketch-cells subtree + the exact-F2 verification subtree
    "join_size_est" -> Map("events" -> 2),
    // ONE daily-sketch aggregate; the rolling merge is a window over
    // one row per day
    "agg_kmv_rolling" -> Map("events" -> 1),
    // ONE per-source sketch aggregate; all-pairs join is sources^2
    // rows of k longs
    "source_overlap_matrix" -> Map("documents" -> 1),
    // fact spine + two tiny distinct-value rank maps
    "layout_rank_normalize" -> Map("orders" -> 3),
    // everything hangs off one tokenize+groupBy(doc_id) exchange;
    // 2 = that exchange's subtree reused imperfectly by the stats agg
    "retrieval_multiquery" -> Map("documents" -> 2),
    "set_overlap_kmv" -> Map("documents" -> 1),
    "sample_mixture" -> Map("documents" -> 3),
    "sample_token_budget" -> Map("documents" -> 2),
    // one assignment scan feeds the (cell, dim) aggregate; the init
    // centroid collect is a separate bounded job, not in this plan
    "kmeans_update" -> Map("embeddings" -> 1),
    // planted union (x2) x the cell self-join a/b (x2) + anti-join
    // left side; exchange reuse collapses what it can at HEAD
    "dedup_semantic" -> Map("embeddings" -> 6),
    // per-doc feature arrays, pairs + moments from one lambda
    // explosion: the whole Gram statistic is a single corpus scan
    "quality_gram" -> Map("documents" -> 1),
    // two singleton-bucket count fetches + doc spine + the broadcast
    // 1-row stats subtree
    "quality_lsq_score" -> Map("documents" -> 4),
    // token-count subtree feeds cells AND the estimate join
    "text_heavy_hitters" -> Map("documents" -> 3),
    // pure map-side quantization
    "embed_quantize_int8" -> Map("embeddings" -> 1),
    // left/right side filters of the same events table
    "join_asof" -> Map("events" -> 2),
    // spans side + incidents side (different groupings of the same scan)
    "join_interval" -> Map("events" -> 2),
    // map-side bit interleave over one scan
    "layout_zorder" -> Map("orders" -> 1),
    // map-side state-machine kernel over one scan
    "layout_hilbert" -> Map("orders" -> 1),
    // ONE events scan builds the checkpointed day x 256 histogram;
    // the final plan reads only the checkpoint (0 scans here — the
    // single pre-checkpoint scan is structural, like pipeline_full's)
    "stat_rolling_quantiles" -> Map("events" -> 1),
    // drift runs entirely over the checkpointed day x 256 summary
    // (the same one-corpus-scan pattern; baseline day is a 1-row
    // broadcast of the summary's min day)
    "stat_drift_tvd" -> Map("events" -> 0),
    // all per-row rules fold into ONE conditional-agg scan per table
    // (checkpointed 1-row result, reused by the referential rule's
    // denominator); the final plan's only base scans are the
    // referential anti-join's probe + build
    "quality_expectations" -> Map("lineitem" -> 1, "orders" -> 2),
    // every stage relation is checkpointed (r14: each is users-sized
    // and read twice — by the next stage's join and its own count
    // row; uncheckpointed, the k=4 entry re-derived events 10x), so
    // the final union plan reads only checkpoints; the one-scan-per-
    // stage pre-checkpoint budget is pinned by the funnelK hook test
    "events_funnel" -> Map("events" -> 0),
    "events_funnel_k4" -> Map("events" -> 0),
    // lag percentiles run the multi-pass selection over the
    // checkpointed stage relations; the result is a driver-built
    // local relation — zero base scans in the final plan
    "events_funnel_lags" -> Map("events" -> 0),
    // one distinct (user, day) scan; cohort reuses the same exchange
    "events_retention" -> Map("events" -> 2),
    // standing-fp scan + incoming scan + the two shingle branches
    "pipeline_incremental" -> Map("documents" -> 4),
    // fact scan + broadcast rank map (the map's own distinct scan is
    // pre-checkpoint, structural like pipeline_full's)
    "sample_curriculum" -> Map("documents" -> 2),
    // one scan through the per-user lead window
    "events_transitions" -> Map("events" -> 1))

  test("per-entry scan-count budgets hold over the dedup/similarity/text families") {
    Engine.configure(spark)
    val report = entryBudgets.keys.toSeq.sorted.map { name =>
      check(name, SparkEntry.queries(name)(spark, TestSpark.sf),
        entryBudgets(name))
    }.mkString("\n")
    info(s"measured scan counts:\n$report")
  }

  // pipeline_full checkpoints between stage 3 and 4, so the standard
  // final-plan walk would see zero base scans; pin both halves
  // explicitly: ALL documents scans live in the pre-checkpoint
  // relation (<= 3: projection + the two shingle branches) and the
  // packed output reads only the checkpoint — so the whole pipeline
  // reads the corpus at most 3 times end-to-end.
  test("pipeline_full: <= 3 documents scans before the checkpoint, zero after") {
    Engine.configure(spark)
    import graft.operators.CorpusOps
    val clean = CorpusOps.pipelineClean(spark, TestSpark.sf)
    val pre = scanCounts(clean)
    assert(pre.getOrElse("documents", 0) <= 3,
      s"pre-checkpoint scans: $pre")
    assert(pre.values.sum <= 3, s"pre-checkpoint scans: $pre")
    val post = scanCounts(CorpusOps.pipelinePack(clean.localCheckpoint()))
    assert(post.isEmpty, s"post-checkpoint base-table scans: $post")
    info(s"pipeline_full: pre=$pre post=$post")
  }

  // funnelK checkpoints every stage relation; the entry budgets above
  // pin the final plan at ZERO events scans. This pins the other half
  // via the checkpoint hook: each stage's PRE-checkpoint relation
  // reads events exactly once (stage 1 = filtered aggregate; stage
  // i+1 = filtered scan joined to stage i's checkpoint leaf), so a
  // k-stage funnel reads the corpus exactly k times end-to-end.
  test("funnelK: each stage's pre-checkpoint relation is one events scan") {
    Engine.configure(spark)
    import graft.operators.FunnelOps
    import org.apache.spark.sql.functions.col
    val ev = Engine.table(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("event_type"),
        (col("ts") - col("ts") % 1000).as("tsn"))
    val stages = Seq("signup", "view", "click", "purchase")
    val perStage = Seq.newBuilder[Map[String, Int]]
    FunnelOps.funnelK(ev, stages, FunnelOps.Uncapped,
      df => { perStage += scanCounts(df); df.localCheckpoint() })
      .collect()
    val measured = perStage.result()
    assert(measured.size == stages.size, s"stage count: $measured")
    measured.zipWithIndex.foreach { case (m, i) =>
      assert(m == Map("events" -> 1),
        s"stage ${i + 1} pre-checkpoint scans: $m")
    }
    info(s"funnelK per-stage pre-checkpoint scans: $measured")
  }

  test("organic-path scan budgets: star paths one scan, pair paths two") {
    Engine.configure(spark)
    import graft.operators.{DedupOps, SimilarityOps}
    val sf = TestSpark.sf
    val cases: Seq[(String, DataFrame, Map[String, Int])] = Seq(
      // star emission is the whole point: ONE corpus scan (window min),
      // vs the groupBy-reps+join-back shape AQE cannot reuse (r9 audit)
      ("minhash_star", DedupOps.minhashStarEdges(spark, sf),
        Map("documents" -> 1)),
      ("simhash_star", DedupOps.simhashStarEdges(spark, sf),
        Map("documents" -> 1)),
      // zero/star/residual branches all reuse the level-0 window
      // exchange: ONE corpus scan
      ("simhash_star_full", DedupOps.simhashStarEdgesFull(spark, sf),
        Map("documents" -> 1)),
      ("minhash_pairs", DedupOps.minhashPairs(spark, sf, planted = false),
        Map("documents" -> 2)),
      ("simhash_pairs", DedupOps.simhashPairs(spark, sf, planted = false),
        Map("documents" -> 2)),
      ("ngram_pairs", DedupOps.ngramJaccardPairs(spark, sf, planted = false),
        Map("documents" -> 2)),
      // fingerprint self-join reuses the winnow exchange (1) + the two
      // per-pair text fetches
      ("substring_organic", DedupOps.substringSpans(
        Engine.table(spark, sf, "documents").select("doc_id", "text")),
        Map("documents" -> 3)),
      ("ivf_organic", SimilarityOps.ivfTopK(spark, sf, planted = false),
        Map("embeddings" -> 2)),
      ("pq_organic", SimilarityOps.pqTopK(spark, sf, planted = false),
        Map("embeddings" -> 4)),
      ("lsh_organic", SimilarityOps.lshBucket(spark, sf, planted = false),
        Map("embeddings" -> 2)))
    val report = cases.map { case (name, df, budget) =>
      check(name, df, budget)
    }.mkString("\n")
    info(s"measured organic scan counts:\n$report")
  }
}
