package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over `documents`:
  * quality scoring, token statistics, fingerprinting, and a heuristic
  * language-ID. All pure per-row expression pipelines (map-side only, no
  * shuffle) — they scale linearly with input splits.
  */
object TextOps {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Quality metrics: token counts, average token length, punctuation and
    * whitespace ratios — the usual cheap filters before expensive dedup.
    */
  val textQuality: Q = Q("text_quality",
    (s, d) => {
      val doc = t(s, d, "documents")
      doc.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(tokens(col("text"))).as("n_tokens"),
        (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
          size(tokens(col("text")))).as("avg_token_len"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
          length(col("text"))).as("punct_ratio"))
    },
    Some("""SELECT doc_id,
      |  CAST(LENGTH(text) AS INT) AS n_chars,
      |  CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
      |       t -> t <> '')) AS INT) AS n_tokens,
      |  CAST(LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS DOUBLE) /
      |    LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), t -> t <> ''))
      |    AS avg_token_len,
      |  CAST(LENGTH(REGEXP_REPLACE(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) /
      |    LENGTH(text) AS punct_ratio
      |FROM documents""".stripMargin))

  /** Canonical-text fingerprint: lowercase, strip non-alphanumerics,
    * collapse whitespace, md5. Equal fingerprints => exact near-dup after
    * normalization (cheap first dedup pass).
    */
  val fingerprint: Q = Q("text_fingerprint",
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      md5(trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " "))).as("fp")),
    Some("""SELECT doc_id,
      |  MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin))

  /** Heuristic language ID: stopword-hit counts per language, argmax with
    * deterministic tiebreak. Oracle-checked: the fixed stopword lists are
    * embedded in the DuckDB SQL too, so the whole scoring path is
    * cross-engine verified.
    */
  val langId: Q = Q("text_langid",
    (s, d) => {
      val stop = Map(
        "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "for", "with", "on"),
        "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
        "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "pour", "dans"))
      val doc = t(s, d, "documents")
      val toks = tokens(lower(col("text")))
      val hitCols = stop.toSeq.sortBy(_._1).map { case (l, words) =>
        size(filter(toks, tk => array_contains(
          array(words.map(lit): _*), tk))).as(s"hits_$l")
      }
      val scored = doc.select(
        (Seq(col("doc_id"), col("lang")) ++ hitCols): _*)
      scored.select(
        col("doc_id"), col("lang"),
        when(col("hits_de") > col("hits_en") && col("hits_de") > col("hits_fr"), "de")
          .when(col("hits_fr") > col("hits_en") && col("hits_fr") > col("hits_de"), "fr")
          .otherwise("en").as("guessed_lang"),
        col("hits_en"), col("hits_de"), col("hits_fr"))
    },
    Some("""WITH scored AS (
      |  SELECT doc_id, lang,
      |    CAST(LEN(LIST_FILTER(
      |      LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> ''),
      |      t -> LIST_CONTAINS(['der','die','das','und','ist','nicht','mit',
      |                          'ein','zu','von'], t))) AS INT) AS hits_de,
      |    CAST(LEN(LIST_FILTER(
      |      LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> ''),
      |      t -> LIST_CONTAINS(['the','and','of','to','a','in','is','for',
      |                          'with','on'], t))) AS INT) AS hits_en,
      |    CAST(LEN(LIST_FILTER(
      |      LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> ''),
      |      t -> LIST_CONTAINS(['le','la','et','les','des','un','une','est',
      |                          'pour','dans'], t))) AS INT) AS hits_fr
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN hits_de > hits_en AND hits_de > hits_fr THEN 'de'
      |       WHEN hits_fr > hits_en AND hits_fr > hits_de THEN 'fr'
      |       ELSE 'en' END AS guessed_lang,
      |  hits_en, hits_de, hits_fr
      |FROM scored""".stripMargin))

  /** Token counting for training-data budgeting: whitespace tokens plus a
    * BPE-ish regex segmentation (letter runs / digit runs / single
    * non-alphanumeric symbols — the shape of GPT-style pre-tokenizers,
    * deterministic and engine-portable). Chars-per-token is the usual
    * sanity metric against a real tokenizer.
    */
  val tokenCount: Q = Q("text_tokens",
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"),
      (length(col("text")).cast("double") /
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))).as("chars_per_token")),
    Some("""SELECT doc_id,
      |  CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
      |       t -> t <> '')) AS INT) AS ws_tokens,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text),
      |       '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS bpe_ish_tokens,
      |  CAST(LENGTH(text) AS DOUBLE) /
      |    LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
      |    AS chars_per_token
      |FROM documents""".stripMargin))

  /** PII redaction: emails, IPv4 addresses and long digit runs (phone-ish)
    * replaced with typed placeholders; per-doc hit counts kept for audit.
    * Map-side only. The synthetic corpus carries no PII, so deterministic
    * contact lines derived from doc_id are appended BEFORE scrubbing in
    * both engines — the redaction path is exercised on every row and the
    * oracle checks the full scrub output, not a no-op.
    */
  val piiScrub: Q = Q("text_pii_scrub",
    (s, d) => {
      val doc = t(s, d, "documents")
      val seeded = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com at 10.0.0."),
        pmod(col("doc_id"), lit(256)), lit(" tel 555 01"), col("doc_id"))
      val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val phone = "\\b[0-9][0-9 ]{5,}[0-9]\\b"
      doc.select(
        col("doc_id"),
        size(regexp_extract_all(seeded, lit(email), lit(0))).as("n_email"),
        size(regexp_extract_all(seeded, lit(ip), lit(0))).as("n_ip"),
        regexp_replace(regexp_replace(regexp_replace(seeded,
          email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("scrubbed"))
    },
    Some("""SELECT doc_id,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(seeded,
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_email,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(seeded,
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ip,
      |  REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(seeded,
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
      |    '\b[0-9][0-9 ]{5,}[0-9]\b', '<PHONE>', 'g') AS scrubbed
      |FROM (SELECT doc_id,
      |        text || ' contact user' || doc_id || '@example.com at 10.0.0.' ||
      |        (doc_id % 256) || ' tel 555 01' || doc_id AS seeded
      |      FROM documents)""".stripMargin))

  /** Deterministic train/val/test assignment: md5 of the doc id, first
    * two hex chars as the bucket — stable across engines, reruns and
    * cluster sizes (no RNG, no row order dependence). 80/10/10 by hex
    * range: train < 'cc', val < 'e6', else test. The standard way to
    * split a 100 TB corpus reproducibly: assignment is a pure map-side
    * function of the key, so any engine re-derives the identical split.
    */
  val splitAssign: Q = Q("split_assign",
    (s, d) => {
      val doc = t(s, d, "documents")
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      doc.select(
        col("doc_id"), bucket.as("bucket"),
        when(bucket < "cc", "train").when(bucket < "e6", "val")
          .otherwise("test").as("split"))
    },
    Some("""SELECT doc_id,
      |  SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
      |  CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |       WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin))

  /** The whole training-corpus pipeline as ONE declarative query:
    * quality filter -> normalized-fingerprint exact dedup (keep the
    * smallest doc_id per fingerprint) -> deterministic split assignment
    * -> per-(split, lang) corpus stats. Every stage is the same
    * expression used by its standalone operator, so the composition is
    * fully oracle-checked; Catalyst fuses the map-side stages into the
    * scan and the only shuffles are the dedup group-by and the final
    * small aggregation — the plan a 100 TB corpus build wants.
    */
  val corpusPipeline: Q = Q("pipeline_corpus",
    (s, d) => {
      val doc = t(s, d, "documents")
      val nTokens = size(tokens(col("text")))
      val fp = md5(trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " ")))
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      val filtered = doc
        .select(col("doc_id"), col("lang"), col("text"),
          nTokens.as("n_tokens"), fp.as("fp"))
        .filter(col("n_tokens") >= 10)
      val deduped = filtered
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .join(filtered, Seq("fp", "doc_id"))
      deduped
        .select(col("lang"), col("n_tokens"),
          when(bucket < "cc", "train").when(bucket < "e6", "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"))
        .orderBy(col("split"), col("lang"))
    },
    Some("""WITH scored AS (
      |  SELECT doc_id, lang,
      |    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
      |         t -> t <> '')) AS INT) AS n_tokens,
      |    MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
      |  FROM documents),
      |filtered AS (SELECT * FROM scored WHERE n_tokens >= 10),
      |deduped AS (
      |  SELECT f.* FROM filtered f
      |  JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM filtered GROUP BY fp) k
      |    ON f.fp = k.fp AND f.doc_id = k.doc_id)
      |SELECT
      |  CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |       WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      |FROM deduped
      |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin))

  /** Repetition-based quality metrics (the Gopher rules, Rae et al.
    * 2021 "Scaling Language Models", table A1: duplicate-line fraction,
    * duplicate-line CHARACTER fraction, top word-n-gram fraction) —
    * the standard removal filters for boilerplate/spam before dedup.
    *
    * All ratios are single IEEE divisions of exact integer counts, so
    * the DuckDB oracle is bit-identical; line/bigram counting shuffles
    * on (doc_id, line/bigram) — fully distributed, no per-executor
    * state, scales with splits at 100 TB.
    */
  val repetition: Q = Q("text_repetition",
    (s, d) => {
      val doc = t(s, d, "documents")
      val lines = doc.select(col("doc_id"),
        explode(split(col("text"), "\n")).as("line"))
      val lineCounts = lines.groupBy(col("doc_id"), col("line"))
        .agg(count(lit(1)).as("c"), max(length(col("line"))).as("len"))
      val lineAgg = lineCounts.groupBy("doc_id").agg(
        sum("c").as("n_lines"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("len")).as("chars"),
        sum(when(col("c") > 1, col("c") * col("len")).otherwise(0L))
          .as("dupchars"))
      val bigrams = doc
        .select(col("doc_id"), tokens(col("text")).as("ts"))
        .select(col("doc_id"), explode(when(size(col("ts")) >= 2,
          expr("transform(sequence(1, size(ts) - 1), " +
            "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"))
          .otherwise(expr("array()").cast("array<string>"))).as("bg"))
      val bigramCounts = bigrams.groupBy(col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("c"))
      val bigramAgg = bigramCounts.groupBy("doc_id")
        .agg(max("c").as("top"), sum("c").as("totalbg"))
      lineAgg.join(bigramAgg, Seq("doc_id"), "left").select(
        col("doc_id"),
        col("n_lines").cast("bigint").as("n_lines"),
        ((col("n_lines") - col("n_distinct")).cast("double") /
          col("n_lines").cast("double")).as("dup_line_frac"),
        when(col("chars") > 0,
          col("dupchars").cast("double") / col("chars").cast("double"))
          .otherwise(0.0).as("dup_line_char_frac"),
        when(col("totalbg").isNotNull,
          col("top").cast("double") / col("totalbg").cast("double"))
          .otherwise(0.0).as("top_bigram_frac"))
    },
    Some("""WITH l AS (
      |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
      |  FROM documents),
      |lc AS (
      |  SELECT doc_id, line, COUNT(*) AS c, LENGTH(line) AS len
      |  FROM l GROUP BY doc_id, line),
      |la AS (
      |  SELECT doc_id, SUM(c) AS n_lines, COUNT(*) AS n_distinct,
      |    SUM(c * len) AS chars,
      |    SUM(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dupchars
      |  FROM lc GROUP BY doc_id),
      |tok AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), t -> t <> '') AS ts
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bg
      |  FROM tok, UNNEST(range(1, LEN(ts))) AS u(i)),
      |bgc AS (
      |  SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
      |bga AS (
      |  SELECT doc_id, MAX(c) AS top, SUM(c) AS totalbg
      |  FROM bgc GROUP BY doc_id)
      |SELECT la.doc_id,
      |  CAST(n_lines AS BIGINT) AS n_lines,
      |  CAST(n_lines - n_distinct AS DOUBLE) / CAST(n_lines AS DOUBLE)
      |    AS dup_line_frac,
      |  CASE WHEN chars > 0
      |    THEN CAST(dupchars AS DOUBLE) / CAST(chars AS DOUBLE)
      |    ELSE 0.0 END AS dup_line_char_frac,
      |  CASE WHEN totalbg IS NOT NULL
      |    THEN CAST(top AS DOUBLE) / CAST(totalbg AS DOUBLE)
      |    ELSE 0.0 END AS top_bigram_frac
      |FROM la LEFT JOIN bga ON la.doc_id = bga.doc_id""".stripMargin))

  /** Cross-document boilerplate-span removal (the C4 recipe: drop any
    * span that occurs verbatim in multiple documents — nav bars,
    * license footers, templated headers). Word-8-gram spans whose
    * document frequency is >= 2 are "boilerplate"; every word position
    * covered by such a span is dropped and the text reassembled from
    * the surviving positions.
    *
    * 100 TB shape: the span stream shuffles ONCE (global DF agg on the
    * span key); the frequent-span set is NOT bounded above — df >= 2 is
    * a lower bound, and on a template-heavy crawl the boilerplate-span
    * set grows with the number of distinct templates (the repo's 10x
    * sweep has corpora where every span is duplicated) — so the
    * span<->freq join is deliberately left size-chosen: both sides are
    * already hash-partitioned on `span` from the DF agg, a shuffle join
    * reuses that partitioning, and AQE still broadcasts when the set is
    * genuinely small (it is at driver SFs). Covered positions aggregate
    * per doc (second shuffle, key = doc_id) and the reassembly is an
    * index-lambda array filter — no per-executor state, no all-pairs
    * anything. BoilerplateSpec pins that no forced broadcast is in the
    * plan.
    */
  val boilerplate: Q = Q("text_boilerplate",
    (s, d) => {
      val doc = t(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("ts"))
      val spans = doc
        .select(col("doc_id"), col("ts"),
          explode(when(size(col("ts")) >= 8,
            expr("sequence(1, size(ts) - 7)"))
            .otherwise(expr("array()").cast("array<int>"))).as("i"))
        .select(col("doc_id"), col("i"),
          expr("array_join(slice(ts, i, 8), ' ')").as("span"))
      val freq = spans.groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2)
        .select(col("span"))
      val covered = spans.join(freq, Seq("span"))
        .select(col("doc_id"), explode(expr("sequence(i, i + 7)")).as("pos"))
        .groupBy(col("doc_id"))
        .agg(collect_set(col("pos")).as("cov"))
      doc.join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"),
          size(col("ts")).as("n_words"),
          when(col("cov").isNotNull, size(col("cov"))).otherwise(0)
            .as("n_removed"),
          when(col("cov").isNotNull,
            expr("array_join(filter(ts, (w, i) -> " +
              "not array_contains(cov, i + 1)), ' ')"))
            .otherwise(expr("array_join(ts, ' ')")).as("scrubbed"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), t -> t <> '') ts
      |  FROM documents),
      |sh AS (SELECT doc_id, CAST(i AS INT) i,
      |    ARRAY_TO_STRING(ts[i:i+7], ' ') AS span
      |  FROM tok, UNNEST(range(1, LEN(ts) - 6)) u(i)
      |  WHERE LEN(ts) >= 8),
      |freq AS (SELECT span FROM sh GROUP BY span
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |cov AS (SELECT DISTINCT sh.doc_id, sh.i + o AS pos
      |  FROM sh JOIN freq USING (span), UNNEST(range(0, 8)) v(o)),
      |words AS (SELECT doc_id, UNNEST(ts) AS w,
      |    GENERATE_SUBSCRIPTS(ts, 1) AS pos FROM tok),
      |kept AS (SELECT w.doc_id,
      |    STRING_AGG(w.w, ' ' ORDER BY w.pos) AS scrubbed
      |  FROM words w LEFT JOIN cov
      |    ON w.doc_id = cov.doc_id AND w.pos = cov.pos
      |  WHERE cov.pos IS NULL GROUP BY w.doc_id),
      |covn AS (SELECT doc_id, COUNT(*) n FROM cov GROUP BY doc_id)
      |SELECT tok.doc_id,
      |  CAST(LEN(ts) AS INT) AS n_words,
      |  CAST(COALESCE(covn.n, 0) AS INT) AS n_removed,
      |  COALESCE(kept.scrubbed, '') AS scrubbed
      |FROM tok LEFT JOIN covn ON tok.doc_id = covn.doc_id
      |LEFT JOIN kept ON tok.doc_id = kept.doc_id
      |ORDER BY tok.doc_id""".stripMargin))

  /** RAG-style document chunking: fixed 64-token windows with 16-token
    * overlap (stride 48), whitespace-token boundaries, chunk starts at
    * 1 + i*stride for i in [0, ceil(max(0, n-64)/48)] — the last chunk
    * always reaches the final token, a chunk fully inside the previous
    * one is never emitted. Map-side only (explode of a per-row
    * transform); at 100 TB chunking is embarrassingly parallel and the
    * output feeds the embedding/ANN entries.
    */
  val chunk: Q = Q("text_chunk",
    (s, d) => {
      val C = 64
      val S = 48 // stride = C - overlap(16)
      t(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .filter(size(col("tk")) > 0)
        .withColumn("n", size(col("tk")))
        .withColumn("m",
          expr(s"cast(1 + (greatest(n - $C, 0) + ${S - 1}) div $S as int)"))
        .select(col("doc_id"), col("n"),
          posexplode(transform(sequence(lit(0), col("m") - 1),
            i => struct((i * S + 1).as("start_tok"),
              least(lit(C), col("n") - i * S).as("n_toks"),
              array_join(slice(col("tk"), i * S + 1, lit(C)), " ")
                .as("chunk_text")))).as(Seq("chunk_id", "c")))
        .select(col("doc_id"), col("chunk_id"),
          col("c.start_tok").as("start_tok"), col("c.n_toks").as("n_toks"),
          col("c.chunk_text").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some("""WITH tok AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), x -> x <> '') tk
      |  FROM documents),
      |sz AS (SELECT doc_id, tk, LEN(tk) n FROM tok WHERE LEN(tk) > 0)
      |SELECT doc_id, CAST(i AS INT) chunk_id,
      |  CAST(i * 48 + 1 AS INT) start_tok,
      |  CAST(LEAST(64, n - i * 48) AS INT) n_toks,
      |  ARRAY_TO_STRING(tk[i*48+1 : i*48+64], ' ') chunk_text
      |FROM sz, UNNEST(GENERATE_SERIES(0,
      |  CAST((GREATEST(n - 64, 0) + 47) // 48 AS INT))) u(i)
      |ORDER BY doc_id, chunk_id""".stripMargin))

  /** Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005) —
    * the frequency sketch completing the engine's sketch family
    * (HLL/FM cardinality, reservoir samples, block-Bloom membership):
    * d = 4 salted hash rows x w = 64 buckets, point query =
    * min over rows of the hashed cell. The sketch is 256 integer
    * cells built by one map-side-combinable aggregation and merges by
    * cell-wise + — at 100 TB each partition sketches independently
    * and the combine is 256 longs, the whole reason CMS exists.
    *
    * Hashes are the cross-engine md5 construction (salted
    * 'cms<r>' + token, two hex chars -> %64, exactly uniform over
    * 256 -> 64); everything is integer, so the FULL pipeline —
    * cells, per-token min estimate, and the est >= exact
    * overestimation bound — is DuckDB-hash-checked. The exact counts
    * ride along as the verification surface (the production point of
    * CMS is precisely NOT needing them; HeavyHitterSpec pins
    * est >= exact and top-1 recovery).
    */
  /** CMS row-r bucket of a token: salted md5, first two hex chars,
    * %64 — shared by the batch entry and [[graft.streaming.StreamHeavyHitters]]
    * (their cells must be the same function of the data).
    */
  def cmsBucket(r: Int, w: Column): Column = {
    val hex = "0123456789abcdef"
    val h = md5(concat(lit(s"cms$r"), w))
    (((instr(lit(hex), substring(h, 1, 1)) - 1) * 16 +
      (instr(lit(hex), substring(h, 2, 1)) - 1)) % 64).cast("int")
  }

  val heavyHitters: Q = Q("text_heavy_hitters",
    (s, d) => {
      def bucketOf(r: Int, w: Column): Column = cmsBucket(r, w)
      val cnt = t(s, d, "documents")
        .select(explode(tokens(lower(col("text")))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("exact"))
      val hashed = cnt.select(col("w"), col("exact"),
        explode(array((0 until 4).map(r =>
          struct(lit(r).as("r"), bucketOf(r, col("w")).as("b"))): _*))
          .as("rb"))
        .select(col("w"), col("exact"), col("rb.r").as("r"),
          col("rb.b").as("b"))
      val cells = hashed.groupBy(col("r"), col("b"))
        .agg(sum(col("exact")).as("cell"))
      hashed.join(cells, Seq("r", "b"))
        .groupBy(col("w"), col("exact"))
        .agg(min(col("cell")).as("est"))
        .select(col("w"), col("est"), col("exact"))
        .orderBy(col("est").desc, col("w"))
        .limit(10)
    },
    Some("""WITH tok AS MATERIALIZED (
      |  SELECT UNNEST(LIST_FILTER(
      |    STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> t <> '')) w
      |  FROM documents),
      |cnt AS MATERIALIZED (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) exact FROM tok GROUP BY w),
      |hashed AS MATERIALIZED (
      |  SELECT w, exact, r,
      |    CAST(((STRPOS('0123456789abcdef',
      |            SUBSTR(MD5('cms' || CAST(r AS VARCHAR) || w), 1, 1)) - 1)
      |          * 16 +
      |          (STRPOS('0123456789abcdef',
      |            SUBSTR(MD5('cms' || CAST(r AS VARCHAR) || w), 2, 1)) - 1))
      |         % 64 AS INT) b
      |  FROM cnt, UNNEST([0, 1, 2, 3]) u(r)),
      |cells AS MATERIALIZED (
      |  SELECT r, b, SUM(exact) cell FROM hashed GROUP BY r, b)
      |SELECT w, CAST(MIN(c.cell) AS BIGINT) est, h.exact
      |FROM hashed h JOIN cells c USING (r, b)
      |GROUP BY w, h.exact
      |ORDER BY est DESC, w LIMIT 10""".stripMargin))

  /** Token-distribution Gini impurity (1 - Σp²) — the LOG-FREE
    * diversity signal (entropy's ln is the one op libm can vary by an
    * ulp, NOTES rule 7; Gini is monotone-comparable for the
    * boilerplate/repetition gate and purely rational): a page of one
    * repeated token scores 0, diverse text approaches 1. Σtf² is an
    * exact integer (inverted per-doc token counts in one explode +
    * two aggregates), so the final doubles are two exact casts and
    * one division — hash-checked.
    */
  val giniEntry: Q = Q("text_gini",
    (s, d) => {
      val tok = t(s, d, "documents")
        .select(col("doc_id"),
          explode(tokens(lower(col("text")))).as("w"))
      tok.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_toks"),
          sum(col("tf") * col("tf")).as("sum_tf2"),
          count(lit(1)).as("n_types"))
        .select(col("doc_id"), col("n_toks"), col("n_types"),
          (lit(1.0) - col("sum_tf2").cast("double") /
            (col("n_toks") * col("n_toks")).cast("double")).as("gini"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
      |  SELECT doc_id,
      |    UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
      |      t -> t <> '')) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_toks,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  1.0 - CAST(SUM(tf * tf) AS DOUBLE) /
      |    CAST(SUM(tf) * SUM(tf) AS DOUBLE) AS gini
      |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  val defs: Seq[Q] = Seq(textQuality, fingerprint, langId, tokenCount,
    piiScrub, splitAssign, corpusPipeline, repetition, boilerplate, chunk,
    heavyHitters, giniEntry)
}
