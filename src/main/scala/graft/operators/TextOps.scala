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
    * deterministic tiebreak. No oracle (rows-only check) — the scoring
    * word lists are engine-internal.
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
    None)

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

  val defs: Seq[Q] = Seq(textQuality, fingerprint, langId, tokenCount)
}
