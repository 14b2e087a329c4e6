package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — BM25-family scoring for
  * decontamination lookups, quality slicing and eval-set search. Two
  * formulations:
  *
  *  - [[bm25Entry]]: fixed query terms folded into ONE projection over
  *    the corpus (tf per term as a conditional count inside the token
  *    filter) + a 1-row broadcast stats aggregate — two corpus scans
  *    total, no explode, the shape for "score every document against a
  *    known probe set" at 100 TB.
  *  - [[multiQueryEntry]]: the inverted-index shape — explode tokens,
  *    semi-filter to the (broadcast) query vocabulary, tf per
  *    (doc, term), document-frequency table, per-(query, doc) fold —
  *    the shape for "many queries at once", where per-query work must
  *    not rescan the corpus.
  *
  * Scoring is the BM25 weighting (k1 = 1.2, b = 0.75) with the
  * Robertson–Sparck-Jones idf kept in its RAW RATIO form
  * (N - df + ½)/(df + ½) instead of its logarithm: ln() is the one
  * piece of BM25 that is not reproducible bit-for-bit across engines
  * (libm differs by 1 ulp — NOTES rule 7), and the ratio is monotone
  * in df exactly like the log form, so rankings per term are
  * unchanged while EVERY double in the pipeline stays a sequence of
  * correctly-rounded IEEE ops both engines perform identically —
  * the full score column is hash-checked, not just the row set.
  * Per-query sums fold term scores in sorted term order (Spark
  * `aggregate` ≡ DuckDB `list_reduce`, NOTES rule 4).
  */
object RetrievalOps {

  import TextOps.tokens

  /** One BM25 term contribution. All inputs integer columns; every
    * double op appears in the same order as in [[oTerm]].
    */
  private def sTerm(tf: Column, dl: Column, n: Column, tt: Column,
      df: Column): Column = {
    val idf = (lit(2L) * (n - df) + lit(1L)).cast("double") /
      (lit(2L) * df + lit(1L)).cast("double")
    val ratio = (dl.cast("long") * n).cast("double") / tt.cast("double")
    val den = tf.cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * ratio)
    idf * (tf.cast("double") * lit(2.2) / den)
  }

  /** DuckDB mirror of [[sTerm]] — identical operation tree. */
  private def oTerm(tf: String, dl: String, n: String, tt: String,
      df: String): String =
    s"(CAST(2 * ($n - $df) + 1 AS DOUBLE) / CAST(2 * $df + 1 AS DOUBLE))" +
      s" * (CAST($tf AS DOUBLE) * CAST(2.2 AS DOUBLE) / " +
      s"(CAST($tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * " +
      s"(CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * " +
      s"(CAST($dl * $n AS DOUBLE) / CAST($tt AS DOUBLE)))))"

  private val probeTerms = Seq("spark", "vector", "stream")

  /** Score every (doc_id, text) row against `terms`: doc_id, dl,
    * tf1..tfN, score. Two scans of `doc` (per-doc projection + the
    * 1-row stats aggregate), no explode.
    */
  def scoreDocs(doc: DataFrame, terms: Seq[String]): DataFrame = {
    val per = doc.select(
      col("doc_id") +:
        size(tokens(col("text"))).as("dl") +:
        terms.zipWithIndex.map { case (tm, i) =>
          size(filter(tokens(col("text")), x => x === lit(tm)))
            .as(s"tf${i + 1}")
        }: _*)
    val statCols = count(lit(1)).as("__n") +:
      sum(col("dl")).as("__tt") +:
      terms.indices.map(i =>
        count(when(col(s"tf${i + 1}") > 0, 1)).as(s"__df${i + 1}"))
    val stats = per.agg(statCols.head, statCols.tail: _*)
    val scored = per.crossJoin(broadcast(stats))
    val ts = terms.indices.map(i =>
      sTerm(col(s"tf${i + 1}"), col("dl"), col("__n"), col("__tt"),
        col(s"__df${i + 1}")))
    scored.select(
      col("doc_id") +: col("dl") +:
        terms.indices.map(i => col(s"tf${i + 1}")) :+
        ts.reduceLeft(_ + _).as("score"): _*)
  }

  /** Test handle: (doc_id, score) for every row of an arbitrary
    * (doc_id, text) relation.
    */
  def scoreForTest(doc: DataFrame, terms: Seq[String]): DataFrame =
    scoreDocs(doc, terms).select(col("doc_id"), col("score"))

  /** Fixed-probe BM25: every document scored against three probe
    * terms, top 20. tf/dl/df/N/TT all integers; the score is the only
    * double and is hash-checked end to end.
    */
  val bm25Entry: Q = Q("retrieval_bm25",
    (s, d) => {
      Engine.configure(s)
      scoreDocs(Engine.table(s, d, "documents"), probeTerms)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },
    Some {
      val tfExprs = probeTerms.zipWithIndex.map { case (tm, i) =>
        s"CAST(LEN(LIST_FILTER(toks, t -> t = '$tm')) AS INT) AS tf${i + 1}"
      }.mkString(",\n      |    ")
      val dfExprs = probeTerms.indices.map(i =>
        s"COUNT(CASE WHEN tf${i + 1} > 0 THEN 1 END) AS df${i + 1}")
        .mkString(", ")
      val terms = probeTerms.indices.map(i =>
        oTerm(s"tf${i + 1}", "dl", "n", "tt", s"df${i + 1}"))
      s"""WITH dt AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '')
      |      AS toks
      |  FROM documents),
      |per AS (
      |  SELECT doc_id, CAST(LEN(toks) AS INT) AS dl,
      |    $tfExprs
      |  FROM dt),
      |st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(dl) AS BIGINT) AS tt, $dfExprs
      |  FROM per)
      |SELECT doc_id, dl, tf1, tf2, tf3,
      |  ((${terms(0)} + ${terms(1)}) + ${terms(2)}) AS score
      |FROM per, st
      |ORDER BY score DESC, doc_id
      |LIMIT 20""".stripMargin
    })

  private val queries: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "vector",
    2 -> "stream", 2 -> "filter", 2 -> "agg",
    3 -> "customer", 3 -> "merge")

  /** Inverted-index multi-query retrieval: top 5 documents per query.
    * The corpus is tokenized ONCE; per-query cost is a broadcast join
    * against the query vocabulary — the 100 TB shape where the index
    * build amortizes over the query batch.
    */
  val multiQueryEntry: Q = Q("retrieval_multiquery",
    (s, d) => {
      Engine.configure(s)
      multiQuery(s, Engine.table(s, d, "documents"))
    },
    multiQueryOracle)

  /** The multi-query scorer over an arbitrary (doc_id, text)
    * relation — the entry body, reusable by sweeps/pipelines.
    */
  def multiQuery(s: SparkSession, doc: DataFrame): DataFrame = {
    {
      import s.implicits._
      val vocab = queries.map(_._2).distinct
      // ONE corpus scan, NO exchange for the per-doc stage: token
      // count (dl) and the per-doc list of query-vocabulary hits are
      // both array projections over the same tokens() call. Deriving
      // them via explode+groupBy (the previous shape) silently dropped
      // zero-token documents from N/tt, diverging from the oracle's
      // COUNT(*)-over-all-docs; a projection keeps every row.
      val perDoc = doc.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"),
        filter(tokens(col("text")), t => t.isin(vocab: _*)).as("hits"))
      // ONE 1-row aggregate carries N, total tokens AND every term's
      // document frequency (df_t = docs with tf_t > 0 =
      // array_contains(hits, t)) — a separate df groupBy over the tf
      // subtree re-scanned the corpus (no exchange to reuse in the
      // projection shape); folding df here keeps the whole index
      // build at exactly TWO corpus scans (PlanBudgetSpec-pinned)
      val statCols = count(lit(1)).as("__n") +:
        sum(col("dl")).as("__tt") +:
        vocab.zipWithIndex.map { case (tm, i) =>
          count(when(array_contains(col("hits"), tm), 1)).as(s"__df$i") }
      val stats = perDoc.agg(statCols.head, statCols.tail: _*)
      val dfRows = stats.select(explode(array(
          vocab.zipWithIndex.map { case (tm, i) =>
            struct(lit(tm).as("term"), col(s"__df$i").as("df")) }: _*))
          .as("e"), col("__n"), col("__tt"))
        .select(col("e.term"), col("e.df"), col("__n"), col("__tt"))
      val tf = perDoc.filter(size(col("hits")) > 0)
        .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val q = queries.toDF("query_id", "term")
      val scored = tf
        .join(broadcast(dfRows), "term")
        .join(broadcast(q), "term")
        .select(col("query_id"), col("doc_id"), col("term"),
          sTerm(col("tf"), col("dl"), col("__n"), col("__tt"), col("df"))
            .as("s"))
      val perQd = scored.groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_terms"),
          aggregate(
            sort_array(collect_list(struct(col("term").as("t"),
              col("s").as("s")))),
            lit(0.0), (acc, x) => acc + x("s")).as("score"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      perQd.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("query_id"), col("doc_id"), col("n_terms"),
          col("score"))
        .orderBy(col("query_id"), col("score").desc, col("doc_id"))
    }
  }

  private def multiQueryOracle: Option[String] = Some {
      val qvals = queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      val vocab = queries.map(_._2).distinct.map(t => s"'$t'").mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $qvals),
      |dt AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '')
      |      AS toks
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(LEN(toks) AS INT) AS dl FROM dt),
      |tok AS (SELECT doc_id, UNNEST(toks) AS term FROM dt),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
      |  WHERE term IN ($vocab) GROUP BY 1, 2),
      |st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt
      |  FROM dl),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT q.query_id, tf.doc_id, tf.term,
      |    ${oTerm("tf", "dl", "n", "tt", "df")} AS s
      |  FROM tf
      |  JOIN df USING (term) JOIN dl USING (doc_id) JOIN q USING (term),
      |    st),
      |per AS (
      |  SELECT query_id, doc_id, CAST(COUNT(*) AS INT) AS n_terms,
      |    LIST_REDUCE(
      |      LIST_TRANSFORM(LIST_SORT(LIST({'t': term, 's': s})), x -> x.s),
      |      (a, b) -> a + b) AS score
      |  FROM sc GROUP BY 1, 2),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS rk
      |  FROM per)
      |SELECT query_id, doc_id, n_terms, score
      |FROM rk WHERE rk <= 5
      |ORDER BY query_id, score DESC, doc_id""".stripMargin
  }

  /** Hybrid retrieval with reciprocal-rank fusion — THE production
    * RAG pattern: a lexical ranking (BM25 over probe terms) and a
    * dense ranking (exact cosine against a query embedding) fused by
    * RRF(d) = 1/(60 + rank_lex(d)) + 1/(60 + rank_dense(d)) (Cormack
    * et al. 2009's k = 60), which needs no score calibration between
    * the two systems. Determinism: ranks are integers (row_number
    * with doc-id tiebreaks), each reciprocal is ONE correctly-rounded
    * division, the fusion is one addition in fixed (lex, dense) order
    * — the fused score itself hash-checks. Missing-from-one-list docs
    * contribute only the side they appear in (full outer join +
    * null-as-zero, the standard RRF treatment).
    *
    * The cost shape is the two retrievals' own (both top-N pruned);
    * the fusion is a join of two N-row lists.
    */
  val hybridEntry: Q = Q("retrieval_hybrid_rrf",
    (s, d) => {
      Engine.configure(s)
      val N = 30
      val lex = scoreDocs(Engine.table(s, d, "documents"), probeTerms)
        .orderBy(col("score").desc, col("doc_id")).limit(N)
        .select(col("doc_id"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))).as("lex_rank"))
      val emb = Engine.table(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      val dense = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
          call_function("dot_vec", col("qe"), col("embedding")).as("dot"))
        .orderBy(col("dot").desc, col("doc_id")).limit(N)
        .select(col("doc_id"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("dot").desc, col("doc_id"))).as("dense_rank"))
      lex.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
          (coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0)))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    Some {
      val tfExprs = probeTerms.zipWithIndex.map { case (tm, i) =>
        s"CAST(LEN(LIST_FILTER(toks, t -> t = '$tm')) AS INT) AS tf${i + 1}"
      }.mkString(", ")
      val dfExprs = probeTerms.indices.map(i =>
        s"COUNT(CASE WHEN tf${i + 1} > 0 THEN 1 END) AS df${i + 1}")
        .mkString(", ")
      val terms = probeTerms.indices.map(i =>
        oTerm(s"tf${i + 1}", "dl", "n", "tt", s"df${i + 1}"))
      s"""WITH dt AS (
      |  SELECT doc_id,
      |    LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '')
      |      AS toks
      |  FROM documents),
      |per AS (
      |  SELECT doc_id, CAST(LEN(toks) AS INT) AS dl, $tfExprs FROM dt),
      |st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(dl) AS BIGINT) AS tt, $dfExprs FROM per),
      |lexall AS (
      |  SELECT doc_id,
      |    ((${terms(0)} + ${terms(1)}) + ${terms(2)}) AS score
      |  FROM per, st),
      |lex AS (
      |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC,
      |    doc_id) AS INT) AS lex_rank
      |  FROM lexall ORDER BY score DESC, doc_id LIMIT 30),
      |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |dall AS (
      |  SELECT e.vec_id AS doc_id,
      |    LIST_REDUCE(
      |      LIST_PREPEND(CAST(0.0 AS DOUBLE),
      |        LIST_TRANSFORM(LIST_ZIP(qv.qe, e.embedding),
      |          pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))),
      |      (acc, x) -> acc + x) AS dot
      |  FROM qv, embeddings e WHERE e.vec_id <> 0),
      |dense AS (
      |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY dot DESC,
      |    doc_id) AS INT) AS dense_rank
      |  FROM dall ORDER BY dot DESC, doc_id LIMIT 30)
      |SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
      |  lex_rank, dense_rank,
      |  COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 0.0) +
      |  COALESCE(CAST(1.0 AS DOUBLE) / (60 + dense_rank), 0.0) AS rrf
      |FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
      |ORDER BY rrf DESC, COALESCE(lex.doc_id, dense.doc_id)
      |LIMIT 10""".stripMargin
    })

  /** Distinctive terms per source — the class-based TF-IDF corpus
    * characterization (what makes each feed different): score(term,
    * source) = tf_in_source · (S + 1)/(sf + 1), where sf = how many
    * sources contain the term (the c-TF-IDF shape with the idf in
    * oracle-safe ratio form). One tokenize + two aggregates + one
    * 5-per-group window; everything integer except one division and
    * one multiply, so the scores hash-check.
    */
  val distinctiveEntry: Q = Q("retrieval_distinctive_terms",
    (s, d) => {
      Engine.configure(s)
      val tok = Engine.table(s, d, "documents")
        .select(col("source"), explode(tokens(lower(col("text"))))
          .as("term"))
      val tf = tok.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val sf = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("sf"))
      val nSources = tf.select(col("source")).distinct()
        .agg(count(lit(1)).as("__s"))
      val scored = tf.join(broadcast(sf), "term")
        .crossJoin(broadcast(nSources))
        .select(col("source"), col("term"), col("tf"), col("sf"),
          (col("tf").cast("double") *
            ((col("__s") + 1).cast("double") /
              (col("sf") + 1).cast("double"))).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("term"), col("tf"),
          col("sf"), col("score"))
        .orderBy(col("source"), col("rk"))
    },
    Some("""WITH tok AS (
      |  SELECT source,
      |    UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
      |      t -> t <> '')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT source, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |sf AS (SELECT term, COUNT(*) AS sf FROM tf GROUP BY term),
      |ns AS (SELECT COUNT(DISTINCT source) AS s FROM tf),
      |scored AS (
      |  SELECT tf.source, tf.term, tf.tf, sf.sf,
      |    CAST(tf.tf AS DOUBLE) *
      |      (CAST(ns.s + 1 AS DOUBLE) / CAST(sf.sf + 1 AS DOUBLE))
      |      AS score
      |  FROM tf JOIN sf USING (term), ns),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY score DESC, term) AS rk
      |  FROM scored)
      |SELECT source, CAST(rk AS INT) AS rk, term, tf,
      |  CAST(sf AS BIGINT) AS sf, score
      |FROM rk WHERE rk <= 5
      |ORDER BY source, rk""".stripMargin))

  val defs: Seq[Q] =
    Seq(bm25Entry, multiQueryEntry, hybridEntry, distinctiveEntry)
}
