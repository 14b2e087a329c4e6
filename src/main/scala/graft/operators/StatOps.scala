package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uncertainty quantification for corpus statistics — hash-based
  * m-out-of-n bootstrap. Any corpus-level number a pipeline gates on
  * (mean tokens/doc, dup rate, quality-pass rate) needs an error bar
  * before it drives a keep/drop decision; the classic bootstrap
  * resamples with replacement B times, which at 100 TB would be B full
  * shuffles. The m-out-of-n variant with DETERMINISTIC hash inclusion
  * does all B replicates in ONE scan: replicate b keeps the rows with
  * h(id, b) % 4 == 0 (m ~ n/4), every replicate statistic is a plain
  * conditional aggregate, and the "resample" is a pure function of the
  * data — reproducible, partition-independent, and oracle-checkable
  * (the estimator literature: Bickel, Götze & van Zwet 1997 on
  * m-out-of-n resampling validity).
  *
  * The b = -1 row is the full-corpus point estimate; rows 0..B-1 are
  * the replicates whose spread is the sampling-error estimate.
  */
object StatOps {

  private val B = 32

  /** Driver entry + FULL oracle: replicate means of tokens-per-doc.
    * One corpus scan: each doc explodes to the replicates that keep it
    * (sequence -1..B-1 filtered by the shared md5 recipe), then one
    * aggregate; the only double is the final single division.
    */
  val bootstrapEntry: Q = Q("stat_bootstrap",
    (s, d) => {
      Engine.configure(s)
      val doc = Engine.table(s, d, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).as("tok"))
      val keep = (b: Column) => b === -1 ||
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          b.cast("string"))), 1, 13), 16, 10).cast("long") % 4 === 0
      doc.select(col("doc_id"), col("tok"),
          explode(filter(sequence(lit(-1), lit(B - 1)), keep)).as("b"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("total_tokens"))
        .select(col("b"), col("n_docs"), col("total_tokens"),
          (col("total_tokens").cast("double") /
            col("n_docs").cast("double")).as("mean_tokens"))
        .orderBy(col("b"))
    },
    Some(s"""WITH per AS (
      |  SELECT doc_id,
      |    LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> ''))
      |      AS tok
      |  FROM documents),
      |rep AS (
      |  SELECT per.doc_id, per.tok, CAST(r.b AS INT) AS b
      |  FROM per, RANGE(-1, $B) r(b)
      |  WHERE r.b = -1 OR
      |    CAST('0x' || SUBSTR(MD5(CAST(per.doc_id AS VARCHAR) || ':' ||
      |      CAST(r.b AS VARCHAR)), 1, 13) AS BIGINT) % 4 = 0)
      |SELECT b, COUNT(*) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
      |  CAST(CAST(SUM(tok) AS BIGINT) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE) AS mean_tokens
      |FROM rep GROUP BY b ORDER BY b""".stripMargin))

  val defs: Seq[Q] = Seq(bootstrapEntry)
}
