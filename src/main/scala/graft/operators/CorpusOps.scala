package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Engine.Materialize

/** Corpus-construction operators a large-scale training-data pipeline
  * runs after cleaning/dedup: benchmark decontamination, context-window
  * sequence packing, stratified mixture sampling, and distinctive-term
  * statistics. All four are deterministic (no RNG — sampling and
  * variant choices are pure hash functions of the key) so every one is
  * DuckDB-oracle-checked end to end.
  *
  * The reference engine stops at SQL; these extend the same declarative
  * style (single DataFrame plans, Catalyst-optimized) to the pipeline
  * stages an LLM corpus build needs at 100 TB.
  */
object CorpusOps {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  private def toks(c: Column, pat: String = "\\s+"): Column =
    filter(split(c, pat), x => x =!= "")

  /** Shared ingest-stage expressions — ONE definition for
    * [[pipelineClean]], [[pipelineIncremental]] and the streaming
    * ingest twin ([[graft.streaming.StreamIngest]]), so the batch
    * pipelines and the stream can never drift (the valueBucket
    * precedent): the normalized content fingerprint, the per-doc
    * ingest projection, and the quality predicate.
    */
  private[graft] def docFp(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text),
      "[^a-z0-9 ]", " "), " +", " ")))

  /** (doc_id, source, lang, text) -> (doc_id, source, lang, ntok, fp,
    * nlines, ndlines) — all map-side, no shuffle.
    */
  private[graft] def ingestProjection(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source"), col("lang"),
      size(toks(col("text"))).as("ntok"), docFp(col("text")).as("fp"),
      size(split(col("text"), "\n")).as("nlines"),
      size(array_distinct(split(col("text"), "\n"))).as("ndlines"))

  /** Quality gate over [[ingestProjection]]'s columns: enough tokens,
    * and repeated lines bounded (the boilerplate-page heuristic).
    */
  private[graft] def ingestQuality: Column = col("ntok") >= 10 &&
    lit(10) * (col("nlines") - col("ndlines")) <= lit(3) * col("nlines")

  /** Test-set decontamination, the GPT-3/PaLM recipe: flag every corpus
    * document sharing an 8-gram (whitespace tokens, lowercased) with a
    * held-out benchmark set. Benchmark = `doc_id % 97 = 0` (a ~1%
    * subset standing in for an eval suite); the remaining 99% is the
    * corpus under test.
    *
    * Scale shape: the benchmark shingle set is tiny relative to the
    * corpus (eval suites are MBs, corpora are TBs), so it broadcasts;
    * the corpus side explodes to shingles map-side, the broadcast
    * semi-join filters virtually everything before the only shuffle
    * (the per-doc hit count). Nothing driver-side; the explode fan-out
    * (~tokens per doc) is the same order as the scan.
    *
    * The synthetic corpus has no organic cross-doc 8-grams, so
    * deterministic sentinel sentences (8 repetitions of a
    * `sentinel<v>` token — one distinct 8-gram per variant v) exercise
    * the overlap path in BOTH engines: benchmark docs carry variants
    * 0..6, corpus docs with `doc_id % 13 = 0` carry their own variant
    * `doc_id % 9`, so seeded docs with variant 7 or 8 stay clean at
    * every scale factor — the flag discriminates, it isn't constant.
    */
  val decontaminate: Q = Q("decontaminate",
    (s, d) => {
      val raw = t(s, d, "documents")
      val seeded = raw.select(col("doc_id"),
        when(col("doc_id") % 97 === 0,
          concat(col("text"), lit(" "), expr(
            "concat_ws(' ', transform(sequence(0, 6), " +
              "v -> repeat(concat('sentinel', cast(v as string), ' '), 8)))")))
          .when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" "),
              expr("repeat(concat('sentinel', cast(doc_id % 9 as string), ' '), 8)")))
          .otherwise(col("text")).as("text"))
      val tk = toks(lower(col("text")))
      val shingles = seeded
        .select(col("doc_id"), tk.as("tk"))
        .select(col("doc_id"), explode(
          when(size(col("tk")) >= 8,
            transform(sequence(lit(1), size(col("tk")) - 7),
              i => array_join(slice(col("tk"), i, lit(8)), " ")))
            .otherwise(array().cast("array<string>"))).as("g"))
      val bench = shingles.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      val hits = shingles.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_hits"))
      raw.filter(col("doc_id") % 97 =!= 0)
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH seeded AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0
      |         THEN text || ' ' ||
      |              ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, 7),
      |                v -> REPEAT('sentinel' || CAST(v AS VARCHAR) || ' ', 8)), ' ')
      |         WHEN doc_id % 13 = 0
      |         THEN text || ' ' ||
      |              REPEAT('sentinel' || CAST(doc_id % 9 AS VARCHAR) || ' ', 8)
      |         ELSE text END AS text
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
      |                x -> x <> '') AS tk
      |  FROM seeded),
      |sh AS (
      |  SELECT doc_id,
      |    UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tk) - 6, 1)),
      |      i -> ARRAY_TO_STRING(tk[i:i+7], ' '))) AS g
      |  FROM tok),
      |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT s.doc_id, CAST(COUNT(DISTINCT s.g) AS BIGINT) AS n_hits
      |  FROM sh s JOIN bench b ON s.g = b.g
      |  WHERE s.doc_id % 97 <> 0
      |  GROUP BY s.doc_id)
      |SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
      |       (COALESCE(h.n_hits, 0) > 0) AS contaminated
      |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 97 <> 0
      |ORDER BY d.doc_id""".stripMargin))

  /** Context-window sequence packing: documents are laid into
    * fixed-token-budget bins (2048 here) greedily in `doc_id` order
    * within each `source` shard — `bin_id = tokens-before-me div
    * budget`, a pure prefix-sum, so a document straddling a boundary
    * starts a packing position deterministically and the whole layout
    * is a window function (one shuffle on the shard key, linear scan
    * within).
    *
    * Scale shape: at 100 TB the partition key is the shard/file, so
    * window state is per-shard and bounded; no global sort, no driver
    * state. The per-bin aggregation underneath is the manifest a
    * packed-sequence writer consumes.
    */
  val packSequences: Q = Q("pack_sequences",
    (s, d) => {
      val doc = t(s, d, "documents")
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = doc
        .select(col("source"), col("doc_id"),
          size(toks(col("text"))).as("n_tokens"))
        .withColumn("bin_id",
          expr("cast((sum(n_tokens) over (partition by source order by doc_id " +
            "rows between unbounded preceding and current row) - n_tokens) " +
            "div 2048 as bigint)"))
      packed.groupBy(col("source"), col("bin_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("bin_id"))
    },
    Some("""WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
      |         x -> x <> '')) AS INT) AS n_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT source, doc_id, n_tokens,
      |    CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |       ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT) AS bin_id
      |  FROM toks)
      |SELECT source, bin_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM packed GROUP BY source, bin_id
      |ORDER BY source, bin_id""".stripMargin))

  /** Stratified mixture sampling — "30% of web, 80% of books, all of
    * code": per-language keep-rates applied via the md5 hash bucket of
    * the key (first two hex chars, 256 buckets), NOT an RNG. The
    * assignment is a pure map-side function of `doc_id`: reproducible
    * across engines, reruns, cluster sizes and row order, and any
    * engine re-derives which rows were kept. This is the only sampling
    * shape that is auditable at 100 TB — `rand()` sampling can never be
    * re-verified. Rates: en 25%, es 50%, de 80%, fr 100%, zh 12.5%
    * (hex thresholds 40/80/cc/ff/20).
    */
  val sampleStratified: Q = Q("sample_stratified",
    (s, d) => {
      val doc = t(s, d, "documents")
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      val threshold = when(col("lang") === "en", "40")
        .when(col("lang") === "es", "80")
        .when(col("lang") === "de", "cc")
        .when(col("lang") === "fr", "ff")
        .otherwise("20")
      doc.select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(col("bucket") < threshold)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang,
      |  SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents
      |WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |  CASE lang WHEN 'en' THEN '40' WHEN 'es' THEN '80'
      |            WHEN 'de' THEN 'cc' WHEN 'fr' THEN 'ff' ELSE '20' END
      |ORDER BY doc_id""".stripMargin))

  /** Temperature-based mixture sampling, the multilingual-corpus
    * balancing recipe (sample source s with probability proportional to
    * p_s^alpha, alpha < 1, so dominant sources downsample toward parity
    * while rare sources keep everything): per-source keep-rates are
    * DERIVED FROM THE DATA — rate_s = sqrt(n_min / n_s) at the
    * alpha = 0.5 default — then applied via the same md5 hash-bucket
    * rule as [[sampleStratified]] (256 buckets, a pure function of
    * `doc_id`, no RNG).
    *
    * Determinism: the threshold is floor(256 * sqrt(n_min / n_s)) —
    * division and IEEE sqrt are correctly rounded, the *256 is an exact
    * exponent shift, so both engines compute the identical bucket count
    * (the reason alpha is pinned at the sqrt point for the oracle:
    * pow(x, a) for general a is a transcendental the Det policy keeps
    * out of checked values). Rendered to two lowercase hex chars for
    * the same string-compare keep rule both engines share.
    *
    * Scale shape: one tiny per-source aggregate (sources number in the
    * dozens), broadcast back onto the corpus, then a pure map-side
    * filter — the corpus is scanned ONCE and never shuffled. The
    * keep-decision stays re-derivable from doc_id at 100 TB, which is
    * what makes the sample auditable.
    */
  val mixtureSample: Q = Q("sample_mixture",
    (s, d) => {
      val doc = t(s, d, "documents")
      val counts = doc.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
      val nMin = counts.agg(min(col("n_s")).as("n_min"))
      val thr = counts.crossJoin(broadcast(nMin))
        .select(col("lang"),
          floor(lit(256) * sqrt(col("n_min").cast("double") / col("n_s")))
            .cast("int").as("thr"))
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      doc.join(broadcast(thr), "lang")
        .select(col("doc_id"), col("lang"), col("thr"), bucket.as("bucket"))
        .filter(col("thr") >= 256 ||
          col("bucket") < format_string("%02x", col("thr")))
        .orderBy(col("doc_id"))
    },
    Some("""WITH c AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
      |m AS (SELECT MIN(n_s) AS n_min FROM c),
      |t AS (SELECT lang,
      |        CAST(FLOOR(256 * SQRT(CAST(n_min AS DOUBLE) / n_s)) AS INT) AS thr
      |      FROM c, m)
      |SELECT d.doc_id, d.lang, t.thr,
      |  SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents d JOIN t ON d.lang = t.lang
      |WHERE t.thr >= 256
      |   OR SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 2) < PRINTF('%02x', t.thr)
      |ORDER BY d.doc_id""".stripMargin))

  /** Token-budget sampling: keep documents per source until a token
    * budget is met (the "N billion tokens per domain" corpus spec),
    * WITHOUT a per-source global sort. Two passes:
    *
    *  1. Histogram pass — per (source, hash-bucket) token totals: a
    *     tiny aggregate (sources x 256 buckets), then a running sum
    *     over the 256-row-per-source histogram finds the highest
    *     bucket whose cumulative tokens fit the budget.
    *  2. Filter pass — map-side `bucket <= cutoff` keep rule against
    *     the broadcast cutoffs.
    *
    * The naive form (ORDER BY hash, cumulative-sum, cut at budget)
    * sorts the whole corpus per source; this bucket-quantile form
    * scans the corpus twice, shuffles only the 256-row histograms, and
    * lands within one bucket (~1/256) of the exact budget — the shape
    * that holds at 100 TB. Fully deterministic: token counts are
    * integers, bucket hex strings order lexicographically =
    * numerically at fixed width, so cutoffs are exact on both engines.
    * A source whose first bucket alone exceeds the budget keeps
    * nothing (no partial-bucket split — splitting would need the
    * in-bucket order the design avoids).
    */
  val tokenBudgetSample: Q = Q("sample_token_budget",
    (s, d) => {
      val doc = t(s, d, "documents")
      val budget = 2000L
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      val tok = doc.select(col("doc_id"), col("lang"), bucket.as("bucket"),
        size(toks(col("text"))).as("ntok"))
      val hist = tok.groupBy(col("lang"), col("bucket"))
        .agg(sum(col("ntok")).as("btok"))
      val cum = hist.withColumn("cumtok",
        sum(col("btok")).over(Window.partitionBy(col("lang"))
          .orderBy(col("bucket"))))
      val cut = cum.filter(col("cumtok") <= budget)
        .groupBy(col("lang")).agg(max(col("bucket")).as("cutoff"))
        .withColumnRenamed("lang", "cut_lang")
      tok.join(broadcast(cut),
          col("lang") === col("cut_lang") && col("bucket") <= col("cutoff"))
        .select(col("doc_id"), col("lang"), col("bucket"), col("ntok"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (SELECT doc_id, lang,
      |    SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
      |    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
      |         t -> t <> '')) AS INT) AS ntok
      |  FROM documents),
      |hist AS (SELECT lang, bucket, SUM(ntok) AS btok
      |  FROM tok GROUP BY lang, bucket),
      |cum AS (SELECT lang, bucket,
      |    SUM(btok) OVER (PARTITION BY lang ORDER BY bucket) AS cumtok
      |  FROM hist),
      |cut AS (SELECT lang, MAX(bucket) AS cutoff
      |  FROM cum WHERE cumtok <= 2000 GROUP BY lang)
      |SELECT t.doc_id, t.lang, t.bucket, t.ntok
      |FROM tok t JOIN cut c ON t.lang = c.lang AND t.bucket <= c.cutoff
      |ORDER BY t.doc_id""".stripMargin))

  /** Distinctive-term statistics per language: term frequency, document
    * frequency, and an integer-exact tf-idf surrogate
    * (`tf * (N*1e6 div df)` — the N/df ratio in ppm instead of
    * `ln(N/df)`, keeping every value integral so the cross-engine hash
    * check is exact; the ranking it induces is idf-monotone). Top 15
    * per language with a total tiebreak order.
    *
    * Scale shape: explode to (lang, token, doc) then two hash
    * aggregations — both get map-side partial aggregation, and the
    * vocabulary (not the corpus) sizes the shuffle. The per-lang doc
    * counts are a tiny aggregate joined back by lang (broadcast).
    */
  val termStats: Q = Q("text_tfidf",
    (s, d) => {
      val doc = t(s, d, "documents")
      val tok = doc.select(col("doc_id"), col("lang"),
        explode(toks(lower(col("text")), "[^a-z0-9]+")).as("token"))
      val perLang = tok.groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val stats = tok.groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      val scored = stats.join(broadcast(perLang), "lang")
        .withColumn("tfidf_ppm", expr("tf * ((n_docs * 1000000) div df)"))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("tfidf_ppm").desc, col("token"))))
        .filter(col("rk") <= 15)
        .select(col("lang"), col("token"), col("tf"), col("df"),
          col("tfidf_ppm"))
        .orderBy(col("lang"), col("tfidf_ppm").desc, col("token"))
    },
    Some("""WITH tok AS (
      |  SELECT doc_id, lang,
      |    UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
      |      x -> x <> '')) AS token
      |  FROM documents),
      |per_lang AS (
      |  SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |  FROM tok GROUP BY lang),
      |stats AS (
      |  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS tf,
      |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM tok GROUP BY lang, token),
      |scored AS (
      |  SELECT s.lang, s.token, s.tf, s.df,
      |    s.tf * ((p.n_docs * 1000000) // s.df) AS tfidf_ppm
      |  FROM stats s JOIN per_lang p USING (lang)),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
      |    ORDER BY tfidf_ppm DESC, token) AS rk
      |  FROM scored)
      |SELECT lang, token, tf, df, tfidf_ppm FROM ranked WHERE rk <= 15
      |ORDER BY lang, tfidf_ppm DESC, token""".stripMargin))

  // ---- distributed BPE subword training / encoding ----------------------

  /** Distributed BPE-merge training (Sennrich et al. 2016, word-level,
    * no end-of-word marker): learn `nMerges` byte-pair merges from the
    * corpus, returned as (rank, left, right, merged, pair_count).
    *
    * Scale shape: the loop state is the WORD-TYPE table — distinct
    * words with counts — whose size is vocabulary-bounded (tens of
    * millions of rows at 100 TB, not trillions of tokens), built by one
    * corpus-wide aggregation. Each round is (a) one partial-aggregated
    * pair-count shuffle over that small table ([[graft.functions.BpePairs]]
    * kernel, map-side combine), (b) ONE argmax row to the driver
    * (count DESC, then lexicographic — deterministic ties), (c) a
    * map-side rewrite ([[graft.functions.BpeApply]], leftmost-first
    * non-overlapping, the canonical semantics).
    *
    * DELTA-UPDATED pair statistics (r11 verdict #3 — the classic
    * production-trainer fix): the full pair-count aggregate runs ONCE;
    * every later round maintains it incrementally. Under a merge of
    * (l, r), only words CONTAINING that adjacency
    * ([[graft.functions.BpeHasPair]]) can change any pair count, so
    * the round aggregates (new pairs - old pairs) over that shrinking
    * subset — typically a tiny fraction of the vocabulary once the
    * high-frequency merges are done — instead of re-exploding every
    * symbol of every word type. The maintained table is exactly equal
    * to a full recount (integer adds, no approximation; BpeSpec pins
    * the equality per round), so the argmax — and therefore the merge
    * table, which the DuckDB oracle RE-TRAINS from scratch — is
    * bit-identical to the naive trainer's. The word-type rewrite
    * itself is map-only; its lineage is cut every few rounds rather
    * than per round, keeping steady-state cost at ~2 small jobs per
    * merge instead of 2 vocabulary-wide shuffles.
    *
    * The word string rides alongside its symbol array so callers (the
    * encode entry's oracle, BpeSpec) can join tokenizations back to
    * text; `bpeTrain` returns (merges, finalWords).
    */
  def bpeTrainWithVocab(corpus: DataFrame,
      nMerges: Int): (DataFrame, DataFrame) = {
    val s = corpus.sparkSession
    import s.implicits._
    var words = corpus
      .select(explode(toks(lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), split(col("w"), "").as("syms"), col("cnt"))
      .materialized
    def pairCounts(of: DataFrame, sign: Long): DataFrame = of
      .select(explode(call_function("bpe_pairs", col("syms"))).as("p"),
        (col("cnt") * sign).as("cnt"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("cnt"))
    var pairStats = pairCounts(words, 1L)
      .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("n"))
      .materialized
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var exhausted = false
    var wordsLineage = 0
    while (rank <= nMerges && !exhausted) {
      val top = pairStats
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, l + r, n))
        val changed = words.filter(
          call_function("bpe_has_pair", col("syms"), lit(l), lit(r)))
        val applied = changed.select(col("w"),
          call_function("bpe_apply", col("syms"), lit(l), lit(r)).as("syms"),
          col("cnt"))
        // maintained += (new - old) as ONE union-aggregate: summing the
        // carried stats with the signed delta rows is arithmetically the
        // old full_outer join + coalesce-add, one exchange cheaper per
        // round (the loop's wall is round-synchronized driver latency,
        // not data — guide §1.2)
        pairStats = pairStats.select(col("l"), col("r"), col("n"))
          .unionAll(pairCounts(changed, -1L))
          .unionAll(pairCounts(applied, 1L))
          .groupBy(col("l"), col("r")).agg(sum(col("n")).as("n"))
          .filter(col("n") > 0)
          .materialized
        words = words.select(col("w"),
          call_function("bpe_apply", col("syms"), lit(l), lit(r)).as("syms"),
          col("cnt"))
        wordsLineage += 1
        // map-only rewrites: cut lineage every few rounds, not per round
        if (wordsLineage >= 4 || rank == nMerges) {
          words = words.materialized; wordsLineage = 0
        }
        rank += 1
      }
    }
    (merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count"),
      if (wordsLineage > 0) words.materialized else words)
  }

  def bpeTrain(corpus: DataFrame, nMerges: Int): DataFrame =
    bpeTrainWithVocab(corpus, nMerges)._1

  /** Oracle-SQL generator: DuckDB replays the trainer exactly — per
    * round a pair-count aggregate over the current tokenization, the
    * same (n DESC, l, r) argmax, and a RECURSIVE-CTE retokenizer that
    * walks each word left to right consuming a pair or a single symbol
    * per step, i.e. bit-for-bit the leftmost-first non-overlapping
    * merge semantics of [[graft.functions.BpeApply]] (overlap-safe:
    * "aaa" + (a,a) -> ["aa","a"] in both engines). Generated
    * programmatically — one CTE triple per round.
    */
  private[operators] def bpeOracleCtes(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT toks[i] l, toks[i+1] r, SUM(cnt) n
         |  FROM t${i - 1}, UNNEST(GENERATE_SERIES(1, LEN(toks) - 1)) u(i)
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |s$i AS (
         |  SELECT w, cnt, toks, 1 AS idx, CAST([] AS VARCHAR[]) acc
         |  FROM t${i - 1}
         |  UNION ALL
         |  SELECT s.w, s.cnt, s.toks,
         |    CASE WHEN s.idx < LEN(s.toks) AND s.toks[s.idx] = m.l
         |              AND s.toks[s.idx+1] = m.r
         |         THEN s.idx + 2 ELSE s.idx + 1 END,
         |    LIST_APPEND(s.acc,
         |      CASE WHEN s.idx < LEN(s.toks) AND s.toks[s.idx] = m.l
         |                AND s.toks[s.idx+1] = m.r
         |           THEN s.toks[s.idx] || s.toks[s.idx+1]
         |           ELSE s.toks[s.idx] END)
         |  FROM s$i s, m$i m WHERE s.idx <= LEN(s.toks)),
         |t$i AS MATERIALIZED (SELECT w, cnt, acc AS toks FROM s$i
         |        WHERE idx = LEN(toks) + 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE w0 AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) cnt FROM (
       |    SELECT UNNEST(LIST_FILTER(
       |      STRING_SPLIT_REGEX(LOWER(text), '\\s+'), t -> t <> '')) w
       |    FROM documents) GROUP BY w),
       |t0 AS MATERIALIZED (
       |  SELECT w, cnt,
       |    LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w)), i -> w[i]) toks
       |  FROM w0),
       |$rounds""".stripMargin
  }

  private val BpeMerges = 16

  /** Driver entry + FULL semantic oracle: the learned merge table
    * itself, hash-checked — DuckDB re-trains the same 16 merges from
    * scratch (generated CTE chain above).
    */
  val bpeTrainTable: Q = Q("text_bpe_train",
    (s, d) => bpeTrain(t(s, d, "documents").select(col("text")), BpeMerges)
      .orderBy(col("rank")),
    Some(s"""${bpeOracleCtes(BpeMerges)}
      |SELECT * FROM (
      |${(1 to BpeMerges).map(i =>
        s"  SELECT $i AS rank, l AS \"left\", r AS \"right\", l || r AS merged, CAST(n AS BIGINT) pair_count FROM m$i")
        .mkString("  UNION ALL\n")}
      |) ORDER BY rank""".stripMargin))

  /** Production encode path: train on the corpus, then tokenize every
    * document with the learned table via the [[graft.functions.BpeEncode]]
    * kernel (merge table rides into the plan as a literal — an implicit
    * broadcast; works on words never seen in training). Output
    * (doc_id, n_words, n_tokens); the oracle recomputes n_tokens by
    * joining doc words to the round-16 tokenization of the vocabulary —
    * equal because encoding replays the trainer's merge sequence.
    */
  val bpeEncode: Q = Q("text_bpe_encode",
    (s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val merges = graft.functions.BpeKernels.packMerges(
        bpeTrain(docs.select(col("text")), BpeMerges)
          .orderBy(col("rank"))
          .select(col("left"), col("right")).collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq)
      docs.select(col("doc_id"),
          explode(toks(lower(col("text")))).as("word"))
        .select(col("doc_id"),
          size(call_function("bpe_encode", col("word"),
            lit(merges))).as("toks"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("toks")).as("n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""${bpeOracleCtes(BpeMerges)},
      |d AS (
      |  SELECT doc_id, UNNEST(LIST_FILTER(
      |    STRING_SPLIT_REGEX(LOWER(text), '\\s+'), t -> t <> '')) w
      |  FROM documents)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_words,
      |  CAST(SUM(LEN(toks)) AS BIGINT) n_tokens
      |FROM d JOIN t$BpeMerges USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ---- n-gram LM scoring (CCNet-style corpus filtering) -----------------

  /** N-gram LM scoring for quality filtering, the CCNet recipe
    * re-expressed exactly: train trigram/bigram/unigram counts on the
    * bulk of the corpus (`doc_id % 97 <> 0`, the same held-out split
    * decontaminate uses), score each held-out document by its STUPID
    * BACKOFF path per trigram position — trigram hit, else bigram
    * (w2 w3) hit, else unigram w3 hit, else OOV. The output is the
    * INTEGER path histogram per doc (n_scored, hit3, hit2, hit1, oov):
    * the log-score is a fixed linear map of these given the backoff
    * discount, but logs are transcendental and not bit-stable across
    * engines (NOTES determinism rule 7), so the driver-checked surface
    * is the exact counts.
    *
    * Scale shape: the count tables are the classic distributed-LM
    * aggregation — corpus-wide explode with map-side combine, sharded
    * by gram hash; scoring is three LEFT hash joins from the scored
    * side's exploded trigrams (tiny vs the corpus at a 1% held-out
    * rate) followed by one per-doc aggregation. Nothing driver-side.
    */
  val lmScore: Q = Q("text_lm_score",
    (s, d) => {
      // the generated held-out docs never miss a trained bigram, so the
      // hit1/oov branches would be constant-zero (undiscriminating) —
      // a deterministic unseen-token suffix forces exactly one oov
      // (trigram/bigram/unigram all miss on 'zzquux') and one hit1
      // ('the' is trained, its bigram context 'zzquux the' is not)
      // per scored doc, the same sentinel trick decontaminate uses
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          toks(lower(when(col("doc_id") % 97 === 0,
            concat(col("text"), lit(" zzquux the")))
            .otherwise(col("text")))).as("tk"))
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      def grams(src: DataFrame, n: Int): DataFrame = src.select(
        explode(when(size(col("tk")) >= n,
          transform(sequence(lit(1), size(col("tk")) - (n - 1)),
            i => array_join(slice(col("tk"), i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"))
      val c3 = grams(train, 3).groupBy(col("g").as("tri"))
        .agg(count(lit(1)).as("c3"))
      val c2 = grams(train, 2).groupBy(col("g").as("bi"))
        .agg(count(lit(1)).as("c2"))
      val c1 = grams(train, 1).groupBy(col("g").as("uni"))
        .agg(count(lit(1)).as("c1"))
      val positions = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), explode(when(size(col("tk")) >= 3,
          transform(sequence(lit(1), size(col("tk")) - 2),
            i => struct(
              array_join(slice(col("tk"), i, lit(3)), " ").as("tri"),
              array_join(slice(col("tk"), i + 1, lit(2)), " ").as("bi"),
              element_at(col("tk"), i + 2).as("uni"))))
          .otherwise(array().cast(
            "array<struct<tri:string,bi:string,uni:string>>"))).as("p"))
        .select(col("doc_id"), col("p.tri").as("tri"), col("p.bi").as("bi"),
          col("p.uni").as("uni"))
      positions
        .join(c3, Seq("tri"), "left_outer")
        .join(c2, Seq("bi"), "left_outer")
        .join(c1, Seq("uni"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_scored"),
          sum(when(col("c3").isNotNull, 1L).otherwise(0L)).as("hit3"),
          sum(when(col("c3").isNull && col("c2").isNotNull, 1L)
            .otherwise(0L)).as("hit2"),
          sum(when(col("c3").isNull && col("c2").isNull &&
            col("c1").isNotNull, 1L).otherwise(0L)).as("hit1"),
          sum(when(col("c3").isNull && col("c2").isNull && col("c1").isNull,
            1L).otherwise(0L)).as("oov"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS MATERIALIZED (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(
      |      CASE WHEN doc_id % 97 = 0 THEN text || ' zzquux the'
      |           ELSE text END), '\s+'),
      |                x -> x <> '') tk
      |  FROM documents),
      |c3 AS MATERIALIZED (
      |  SELECT g tri, CAST(COUNT(*) AS BIGINT) c3 FROM (
      |    SELECT UNNEST(LIST_TRANSFORM(
      |      GENERATE_SERIES(1, GREATEST(LEN(tk) - 2, 0)),
      |      i -> ARRAY_TO_STRING(tk[i:i+2], ' '))) g
      |    FROM tok WHERE doc_id % 97 <> 0) GROUP BY g),
      |c2 AS MATERIALIZED (
      |  SELECT g bi, CAST(COUNT(*) AS BIGINT) c2 FROM (
      |    SELECT UNNEST(LIST_TRANSFORM(
      |      GENERATE_SERIES(1, GREATEST(LEN(tk) - 1, 0)),
      |      i -> ARRAY_TO_STRING(tk[i:i+1], ' '))) g
      |    FROM tok WHERE doc_id % 97 <> 0) GROUP BY g),
      |c1 AS MATERIALIZED (
      |  SELECT g uni, CAST(COUNT(*) AS BIGINT) c1 FROM (
      |    SELECT UNNEST(tk) g FROM tok WHERE doc_id % 97 <> 0) GROUP BY g),
      |pos AS (
      |  SELECT doc_id,
      |    ARRAY_TO_STRING(tk[i:i+2], ' ') tri,
      |    ARRAY_TO_STRING(tk[i+1:i+2], ' ') bi,
      |    tk[i+2] uni
      |  FROM tok, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(tk) - 2, 0))) u(i)
      |  WHERE doc_id % 97 = 0)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_scored,
      |  CAST(SUM(CASE WHEN c3.c3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) hit3,
      |  CAST(SUM(CASE WHEN c3.c3 IS NULL AND c2.c2 IS NOT NULL
      |       THEN 1 ELSE 0 END) AS BIGINT) hit2,
      |  CAST(SUM(CASE WHEN c3.c3 IS NULL AND c2.c2 IS NULL
      |       AND c1.c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) hit1,
      |  CAST(SUM(CASE WHEN c3.c3 IS NULL AND c2.c2 IS NULL
      |       AND c1.c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) oov
      |FROM pos
      |LEFT JOIN c3 USING (tri)
      |LEFT JOIN c2 USING (bi)
      |LEFT JOIN c1 USING (uni)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Weighted PRIORITY sampling (Duffield-Lund-Thorup, JACM 54(6)
    * 2007): keep the k items with the largest priority w_i / u_i and
    * estimate any subset sum unbiasedly via max(w_i, tau), tau = the
    * (k+1)-th priority. The scheme of choice for "sample documents
    * proportional to quality/length in ONE pass with principled
    * weights attached" — near-optimal variance among k-sample
    * estimators, and the per-item state is a single priority.
    *
    * Determinism at 100 TB (the auditable-sampling rule of
    * [[sampleStratified]]): u_i is NOT an RNG but THREE MINSTD steps
    * from the id — r = ((id mod (M-1)) + 1) * 48271^3 step-wise mod
    * M, u = r / M, M = 2^31 - 1 (one step never wraps for small ids,
    * leaving u tiny and id-correlated — three wraps mix; every
    * product stays under 2^47, overflow-free in both engines) — so
    * every engine re-derives the sample; priority
    * = w * M / r uses two correctly-rounded IEEE ops on exact integer
    * inputs, so DuckDB hash-matches the doubles exactly (no
    * transcendentals — the reason for choosing DLT's w/u priorities
    * over Efraimidis-Spirakis' u^(1/w) keys).
    *
    * Scale shape: one map-side priority projection + ONE TakeOrdered
    * job (no global sort, no shuffle of the corpus) whose k+1 head
    * rows land on the driver — bounded by construction — where tau
    * and the estimator are computed locally. The previous
    * TopK-checkpoint + tau-aggregate + re-sort shape ran THREE jobs
    * for the same k+1 rows (the r12 `sample_priority` bench
    * regression); this is one.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val M = 2147483647L
    val r0 = (pmod(col(idCol), lit(M - 1)) + 1) * lit(48271L) % lit(M)
    val r1 = r0 * lit(48271L) % lit(M)
    val r = r1 * lit(48271L) % lit(M)
    val keyed = df
      .withColumn("__pr",
        col(weightCol).cast("double") * lit(M.toDouble) /
          r.cast("double"))
    val top = keyed
      // a null weight has no priority and is not sampleable (it would
      // also sort last under desc) — drop it before the head so the
      // driver-side getDouble below can never see a null priority
      .filter(col("__pr").isNotNull)
      .orderBy(col("__pr").desc, col(idCol).asc)
      .head(k + 1) // TakeOrdered; k+1 rows of driver state, bounded
    val prIdx = keyed.schema.fieldIndex("__pr")
    val tau = if (top.length < k + 1) 0.0 else top.last.getDouble(prIdx)
    val idIdx = keyed.schema.fieldIndex(idCol)
    val wIdx = keyed.schema.fieldIndex(weightCol)
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      top.take(k).map { rw =>
        // null weight -> est tau, matching the pre-r13 expression
        // greatest(weight, tau)'s null semantics (NULL loses greatest);
        // such a row can only reach the head when the corpus has fewer
        // than k+1 non-null weights (null priority sorts last in desc)
        val w = Option(rw.get(wIdx))
          .map(_.asInstanceOf[Number].doubleValue()).getOrElse(tau)
        Row(rw.get(idIdx), rw.get(wIdx), rw.getDouble(prIdx),
          math.max(w, tau))
      }: _*)
    df.sparkSession.createDataFrame(rows, StructType(Seq(
      keyed.schema(idIdx), keyed.schema(wIdx),
      StructField("priority", DoubleType, nullable = false),
      StructField("est_weight", DoubleType, nullable = false))))
  }

  private val PriorityK = 100

  /** Driver entry + full oracle: DLT priority sample of documents
    * weighted by byte length; DuckDB re-derives the MINSTD uniforms,
    * the priorities, the (k+1)-th threshold and the estimator — every
    * double hash-compared exactly.
    */
  val prioritySampleQ: Q = Q("sample_priority",
    (s, d) => prioritySample(
      t(s, d, "documents").select(col("doc_id"),
        octet_length(col("text")).cast("long").as("w")),
      "doc_id", "w", PriorityK).orderBy(col("doc_id")),
    Some(s"""WITH pr AS (
      |  SELECT doc_id, CAST(STRLEN(text) AS BIGINT) AS w,
      |    CAST(STRLEN(text) AS DOUBLE) * 2147483647.0 /
      |      CAST((((doc_id % 2147483646) + 1) * 48271 % 2147483647)
      |           * 48271 % 2147483647 * 48271 % 2147483647
      |           AS DOUBLE) AS priority
      |  FROM documents),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) rn
      |  FROM pr),
      |tau AS (
      |  SELECT COALESCE(MAX(CASE WHEN rn = ${PriorityK + 1}
      |    THEN priority END), 0.0) t FROM ranked)
      |SELECT doc_id, w, priority,
      |  GREATEST(CAST(w AS DOUBLE), t) AS est_weight
      |FROM ranked, tau WHERE rn <= $PriorityK
      |ORDER BY doc_id""".stripMargin))

  /** Per-stratum DLT priority sampling — the corpus-BALANCING recipe:
    * top-k priorities WITHIN each group (source here), so every shard
    * contributes k quality-weighted documents with per-stratum
    * estimator thresholds. One window rank over (group, priority) —
    * a single shuffle on the group key, no driver state at all (the
    * per-group tau rides in the same window as the (k+1)-th
    * priority). The grouped twin of [[prioritySample]], same MINSTD
    * determinism.
    */
  def prioritySampleGrouped(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val M = 2147483647L
    val r0 = (pmod(col(idCol), lit(M - 1)) + 1) * lit(48271L) % lit(M)
    val r = r0 * lit(48271L) % lit(M) * lit(48271L) % lit(M)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__pr").desc, col(idCol).asc)
    df.withColumn("__pr",
        col(weightCol).cast("double") * lit(M.toDouble) / r.cast("double"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__tau",
        coalesce(max(when(col("__rn") === k + 1, col("__pr")))
          .over(Window.partitionBy(col(groupCol))), lit(0.0)))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col(idCol), col(weightCol),
        col("__pr").as("priority"),
        greatest(col(weightCol).cast("double"), col("__tau"))
          .as("est_weight"))
  }

  /** Driver entry + full oracle for the grouped variant: k = 40 per
    * source, per-group thresholds re-derived by DuckDB's own window.
    */
  val prioritySampleGroupedQ: Q = Q("sample_priority_grouped",
    (s, d) => prioritySampleGrouped(
      t(s, d, "documents").select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("w")),
      "source", "doc_id", "w", 40)
      .orderBy(col("source"), col("doc_id")),
    Some("""WITH pr AS (
      |  SELECT source, doc_id, CAST(STRLEN(text) AS BIGINT) AS w,
      |    CAST(STRLEN(text) AS DOUBLE) * 2147483647.0 /
      |      CAST((((doc_id % 2147483646) + 1) * 48271 % 2147483647)
      |           * 48271 % 2147483647 * 48271 % 2147483647
      |           AS DOUBLE) AS priority
      |  FROM documents),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY priority DESC, doc_id) rn
      |  FROM pr),
      |tau AS (
      |  SELECT source,
      |    COALESCE(MAX(CASE WHEN rn = 41 THEN priority END), 0.0) t
      |  FROM ranked GROUP BY source)
      |SELECT r.source, doc_id, w, priority,
      |  GREATEST(CAST(w AS DOUBLE), t.t) AS est_weight
      |FROM ranked r JOIN tau t ON r.source = t.source WHERE rn <= 40
      |ORDER BY r.source, doc_id""".stripMargin))

  /** The WHOLE training-data pipeline as ONE oracle-checked DAG — the
    * stages a real corpus build chains, in production order:
    *
    *  1. quality filter — Gopher-style integer-exact rules (≥ 10
    *     tokens, duplicate-line fraction ≤ 0.3, both pure array math:
    *     `10·(nlines − ndistinct) ≤ 3·nlines` keeps the test integral);
    *  2. near-dup dedup — normalized-fingerprint (lowercase, strip
    *     punctuation, collapse whitespace) survivor via ONE window
    *     `row_number() = 1` per fp (no groupBy+self-join: one consumer
    *     of the scan, one shuffle on fp);
    *  3. decontamination — the [[decontaminate]] 8-gram recipe
    *     verbatim (sentinel-seeded so the overlap path fires at every
    *     SF): benchmark (`doc_id % 97 = 0`) shingles broadcast, corpus
    *     docs sharing any 8-gram dropped by left-anti join;
    *  4. mixture sampling — [[mixtureSample]]'s temperature rule with
    *     rates DERIVED FROM THE SURVIVING SET (floor(256·sqrt(n_min /
    *     n_s)) md5-bucket thresholds — the rates a real run computes
    *     after cleaning, not before);
    *  5. sequence packing — [[packSequences]]'s prefix-sum bins over
    *     the sampled set; the manifest is the checked output.
    *
    * Scan budget (PlanBudgetSpec pins ≤ 3 `documents` scans): stages
    * 1–2 are one projection scan; the two shingle branches of stage 3
    * are scans two and three; the post-anti-join survivor set is
    * localCheckpoint-ed, so the stage-4 rate aggregate, its broadcast
    * join back, and the stage-5 window all read the checkpoint — at
    * 100 TB the corpus is read three times end-to-end, never more,
    * and the only shuffles are fp, the per-doc hit count, the tiny
    * lang histogram and the per-source packing window.
    */
  /** Stages 1–3 of [[pipelineFull]] (quality → fp-dedup → decontam),
    * pre-checkpoint: every `documents` scan of the whole pipeline
    * lives in THIS relation (PlanBudgetSpec pins it at 3).
    */
  def pipelineClean(s: SparkSession, d: String): DataFrame = {
      val raw = t(s, d, "documents")
      // stage 1+2: one scan -> quality filter -> fp-window survivor
      val per = ingestProjection(raw.filter(col("doc_id") % 97 =!= 0))
      val quality = per.filter(ingestQuality)
      val deduped = quality
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .drop("rn", "fp", "nlines", "ndlines")
      // stage 3: the decontaminate seeding + 8-gram overlap, verbatim
      val seeded = raw.select(col("doc_id"),
        when(col("doc_id") % 97 === 0,
          concat(col("text"), lit(" "), expr(
            "concat_ws(' ', transform(sequence(0, 6), " +
              "v -> repeat(concat('sentinel', cast(v as string), ' '), 8)))")))
          .when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" "),
              expr("repeat(concat('sentinel', cast(doc_id % 9 as string), ' '), 8)")))
          .otherwise(col("text")).as("text"))
      val tk = toks(lower(col("text")))
      val shingles = seeded
        .select(col("doc_id"), tk.as("tk"))
        .select(col("doc_id"), explode(
          when(size(col("tk")) >= 8,
            transform(sequence(lit(1), size(col("tk")) - 7),
              i => array_join(slice(col("tk"), i, lit(8)), " ")))
            .otherwise(array().cast("array<string>"))).as("g"))
      val bench = shingles.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      val hits = shingles.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .select(col("doc_id")).distinct()
      deduped.join(hits, Seq("doc_id"), "left_anti")
  }

  /** Stages 4–5 of [[pipelineFull]] over a (doc_id, source, lang,
    * ntok) survivor relation — reads NO base table (PlanBudgetSpec
    * pins zero `documents` scans downstream of the checkpoint).
    */
  def pipelinePack(clean: DataFrame): DataFrame = {
      // stage 4: temperature mixture rates from the SURVIVING set
      val counts = clean.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
      val nMin = counts.agg(min(col("n_s")).as("n_min"))
      val thr = counts.crossJoin(broadcast(nMin))
        .select(col("lang"),
          floor(lit(256) * sqrt(col("n_min").cast("double") / col("n_s")))
            .cast("int").as("thr"))
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      val sampled = clean.join(broadcast(thr), "lang")
        .filter(col("thr") >= 256 ||
          bucket < format_string("%02x", col("thr")))
      // stage 5: pack manifest
      val packed = sampled
        .withColumn("bin_id",
          expr("cast((sum(ntok) over (partition by source order by doc_id " +
            "rows between unbounded preceding and current row) - ntok) " +
            "div 2048 as bigint)"))
      packed.groupBy(col("source"), col("bin_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("bigint").as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("bin_id"))
  }

  val pipelineFull: Q = Q("pipeline_full",
    (s, d) => pipelinePack(pipelineClean(s, d).materialized),
    Some("""WITH per AS (
      |  SELECT doc_id, source, lang,
      |    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
      |         t -> t <> '')) AS INT) AS ntok,
      |    MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp,
      |    CAST(LEN(STRING_SPLIT(text, chr(10))) AS INT) AS nlines,
      |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, chr(10)))) AS INT)
      |      AS ndlines
      |  FROM documents WHERE doc_id % 97 <> 0),
      |quality AS (
      |  SELECT * FROM per
      |  WHERE ntok >= 10 AND 10 * (nlines - ndlines) <= 3 * nlines),
      |deduped AS (
      |  SELECT doc_id, source, lang, ntok FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
      |      AS rn FROM quality)
      |  WHERE rn = 1),
      |seeded AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0
      |         THEN text || ' ' ||
      |              ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, 7),
      |                v -> REPEAT('sentinel' || CAST(v AS VARCHAR) || ' ', 8)), ' ')
      |         WHEN doc_id % 13 = 0
      |         THEN text || ' ' ||
      |              REPEAT('sentinel' || CAST(doc_id % 9 AS VARCHAR) || ' ', 8)
      |         ELSE text END AS text
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
      |                x -> x <> '') AS tk
      |  FROM seeded),
      |sh AS (
      |  SELECT doc_id,
      |    UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tk) - 6, 1)),
      |      i -> ARRAY_TO_STRING(tk[i:i+7], ' '))) AS g
      |  FROM tok),
      |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.g = b.g
      |  WHERE s.doc_id % 97 <> 0),
      |clean AS (
      |  SELECT d.* FROM deduped d
      |  WHERE d.doc_id NOT IN (SELECT doc_id FROM hits)),
      |c AS (SELECT lang, COUNT(*) AS n_s FROM clean GROUP BY lang),
      |m AS (SELECT MIN(n_s) AS n_min FROM c),
      |thr AS (SELECT lang,
      |    CAST(FLOOR(256 * SQRT(CAST(n_min AS DOUBLE) / n_s)) AS INT)
      |      AS thr
      |  FROM c, m),
      |sampled AS (
      |  SELECT cl.* FROM clean cl JOIN thr t ON cl.lang = t.lang
      |  WHERE t.thr >= 256
      |     OR SUBSTR(MD5(CAST(cl.doc_id AS VARCHAR)), 1, 2)
      |        < PRINTF('%02x', t.thr)),
      |packed AS (
      |  SELECT source, doc_id, ntok,
      |    CAST((SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
      |       ROWS UNBOUNDED PRECEDING) - ntok) // 2048 AS BIGINT) AS bin_id
      |  FROM sampled)
      |SELECT source, bin_id, COUNT(*) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS bin_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM packed GROUP BY source, bin_id
      |ORDER BY source, bin_id""".stripMargin))

  /** Incremental-ingest twin of [[pipelineFull]] — the shape a
    * PRODUCTION corpus runs daily: a new shard arrives (here
    * `doc_id % 5 = 0` stands in for today's crawl), and only IT is
    * cleaned, while dedup runs against the STANDING corpus's
    * fingerprint set instead of re-processing history:
    *
    *  1. quality-filter the incoming shard (pipelineFull's rules);
    *  2. anti-join incoming fingerprints against the standing
    *     corpus's fingerprint set (`% 5 <> 0` docs) — the standing
    *     side is a fp-projection aggregate, never re-cleaned;
    *  3. dedup WITHIN the shard (same one-window survivor);
    *  4. decontaminate the survivors against the benchmark 8-gram
    *     set (sentinel-seeded, the [[decontaminate]] recipe);
    *  5. emit the per-source ingest report (docs, tokens, id range).
    *
    * At 100 TB the standing-fp relation is the only history touched —
    * in production it is a maintained table (or a block Bloom filter,
    * [[DedupOps]] incremental precedent), so daily cost scales with
    * the SHARD, not the corpus. All stages reuse pipelineFull's exact
    * expressions, so the composition semantics stay oracle-pinned.
    */
  val pipelineIncremental: Q = Q("pipeline_incremental",
    (s, d) => {
      val raw = t(s, d, "documents")
      val standingFp = raw.filter(col("doc_id") % 5 =!= 0)
        .select(docFp(col("text")).as("fp")).distinct()
      val incoming = ingestProjection(raw
        .filter(col("doc_id") % 5 === 0 && col("doc_id") % 97 =!= 0))
      val quality = incoming.filter(ingestQuality)
      val fresh = quality.join(standingFp, Seq("fp"), "left_anti")
      val deduped = fresh
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      val seeded = raw.select(col("doc_id"),
        when(col("doc_id") % 97 === 0,
          concat(col("text"), lit(" "), expr(
            "concat_ws(' ', transform(sequence(0, 6), " +
              "v -> repeat(concat('sentinel', cast(v as string), ' '), 8)))")))
          .when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" "),
              expr("repeat(concat('sentinel', cast(doc_id % 9 as string), ' '), 8)")))
          .otherwise(col("text")).as("text"))
      val tk = toks(lower(col("text")))
      val shingles = seeded
        .select(col("doc_id"), tk.as("tk"))
        .select(col("doc_id"), explode(
          when(size(col("tk")) >= 8,
            transform(sequence(lit(1), size(col("tk")) - 7),
              i => array_join(slice(col("tk"), i, lit(8)), " ")))
            .otherwise(array().cast("array<string>"))).as("g"))
      val bench = shingles.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      val hits = shingles.filter(col("doc_id") % 5 === 0 &&
          col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .select(col("doc_id")).distinct()
      deduped.join(hits, Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("bigint").as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"))
    },
    Some("""WITH fp_all AS (
      |  SELECT doc_id, source, lang, text,
      |    MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
      |  FROM documents),
      |standing AS (SELECT DISTINCT fp FROM fp_all WHERE doc_id % 5 <> 0),
      |inc AS (
      |  SELECT doc_id, source, lang, fp,
      |    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
      |         t -> t <> '')) AS INT) AS ntok,
      |    CAST(LEN(STRING_SPLIT(text, chr(10))) AS INT) AS nlines,
      |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, chr(10)))) AS INT)
      |      AS ndlines
      |  FROM fp_all WHERE doc_id % 5 = 0 AND doc_id % 97 <> 0),
      |quality AS (
      |  SELECT * FROM inc
      |  WHERE ntok >= 10 AND 10 * (nlines - ndlines) <= 3 * nlines),
      |fresh AS (
      |  SELECT * FROM quality WHERE fp NOT IN (SELECT fp FROM standing)),
      |deduped AS (
      |  SELECT doc_id, source, lang, ntok FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
      |      AS rn FROM fresh)
      |  WHERE rn = 1),
      |seeded AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0
      |         THEN text || ' ' ||
      |              ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, 7),
      |                v -> REPEAT('sentinel' || CAST(v AS VARCHAR) || ' ', 8)), ' ')
      |         WHEN doc_id % 13 = 0
      |         THEN text || ' ' ||
      |              REPEAT('sentinel' || CAST(doc_id % 9 AS VARCHAR) || ' ', 8)
      |         ELSE text END AS text
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
      |                x -> x <> '') AS tk
      |  FROM seeded),
      |sh AS (
      |  SELECT doc_id,
      |    UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tk) - 6, 1)),
      |      i -> ARRAY_TO_STRING(tk[i:i+7], ' '))) AS g
      |  FROM tok),
      |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.g = b.g
      |  WHERE s.doc_id % 5 = 0 AND s.doc_id % 97 <> 0)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM deduped
      |WHERE doc_id NOT IN (SELECT doc_id FROM hits)
      |GROUP BY source
      |ORDER BY source""".stripMargin))

  /** Quality-curriculum sampling — keep-rate RISES with the document's
    * quality decile (the curriculum/annealing recipe: low-quality data
    * subsampled hard, high-quality kept whole). The decile is a
    * DISTRIBUTED rank of the distinct score values
    * ([[Compaction.rankMap]] — no single-partition window whatever the
    * score NDV), the keep decision is the md5-bucket rule of
    * [[sampleStratified]] (rate (d+1)/10 as the integer hex threshold
    * ((d+1)·256) div 10 — pure integer math, auditable at 100 TB).
    * Score = n_chars here; any numeric quality column works.
    */
  val curriculumSample: Q = Q("sample_curriculum",
    (s, d) => {
      val doc = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val rm = Compaction.rankMap(doc, "n_chars", 10L)
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      doc.join(broadcast(rm), "n_chars")
        .withColumn("thr", expr("((n_chars_rank + 1) * 256) div 10"))
        .filter(col("thr") >= 256 ||
          bucket < format_string("%02x", col("thr").cast("int")))
        .groupBy(col("n_chars_rank").as("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("total_chars"))
        .orderBy(col("decile"))
    },
    Some("""WITH rv AS (
      |  SELECT n_chars,
      |    ((ROW_NUMBER() OVER (ORDER BY n_chars) - 1) * 10)
      |      // COUNT(*) OVER () AS decile
      |  FROM (SELECT DISTINCT n_chars FROM documents)),
      |k AS (
      |  SELECT d.doc_id, rv.decile, d.n_chars,
      |    ((rv.decile + 1) * 256) // 10 AS thr
      |  FROM documents d JOIN rv ON d.n_chars = rv.n_chars)
      |SELECT CAST(decile AS BIGINT) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM k
      |WHERE thr >= 256
      |   OR SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2)
      |      < PRINTF('%02x', CAST(thr AS INT))
      |GROUP BY decile
      |ORDER BY decile""".stripMargin))

  val defs: Seq[Q] = Seq(decontaminate, packSequences, sampleStratified,
    mixtureSample, tokenBudgetSample, prioritySampleQ,
    prioritySampleGroupedQ, termStats,
    bpeTrainTable, bpeEncode, lmScore, pipelineFull, pipelineIncremental,
    curriculumSample)
}
