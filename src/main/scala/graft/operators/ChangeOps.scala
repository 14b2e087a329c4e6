package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application (MERGE INTO semantics) — the incremental-
  * maintenance primitive for a living corpus: a snapshot plus an
  * ordered stream of upserts/deletes produces the next snapshot.
  * Re-expressed as a plain Spark plan: ONE window over the changelog
  * picks each key's last operation (row_number by seq desc — the
  * deterministic last-writer-wins), then the snapshot anti-joins the
  * touched keys and unions the surviving upserts. Two shuffles total
  * (changelog window + the key join), independent of how many
  * operations pile up per key — at 100 TB the changelog is usually
  * tiny against the snapshot and the anti-join broadcasts.
  */
object ChangeOps {

  /** `snapshot`: current rows with key `keyCol`. `changelog`: rows
    * (keyCol, seq, op, <payload columns matching snapshot>), op in
    * {'upsert', 'delete'}, seq a total order per key (ties broken by
    * op so equal-seq input is still deterministic — callers should
    * supply unique seqs). Returns the next snapshot.
    */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("seq").desc, col("op").desc)
    val last = changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val touched = last.select(col(keyCol)).distinct()
    val kept = snapshot.join(touched, Seq(keyCol), "left_anti")
    val upserts = last.filter(col("op") === "upsert")
      .select(snapshot.columns.map(col): _*)
    kept.unionByName(upserts)
  }

  /** Driver entry + FULL oracle: an organic changelog derived from the
    * corpus — deletes for doc_id % 7 = 0, re-writes (uppercased text)
    * for doc_id % 5 = 0, brand-new docs for doc_id % 11 = 0 at
    * id + 5,000,000; keys hit by BOTH delete and rewrite (% 35 = 0)
    * exercise last-writer-wins (the rewrite carries the higher seq).
    * The checked surface is the full merged snapshot.
    */
  val mergeEntry: Q = Q("snapshot_merge",
    (s, d) => {
      Engine.configure(s)
      val snap = Engine.table(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val del = snap.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit(1L).as("seq"), lit("delete").as("op"),
          lit(null).cast("string").as("text"),
          lit(null).cast("string").as("lang"))
      val rewrite = snap.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), lit(2L).as("seq"), lit("upsert").as("op"),
          upper(col("text")).as("text"), col("lang"))
      val insert = snap.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          lit(3L).as("seq"), lit("upsert").as("op"),
          concat(lit("new:"), col("text")).as("text"), col("lang"))
      val log = del.unionByName(rewrite).unionByName(insert)
      applyChangelog(snap, log, "doc_id")
        .select(col("doc_id"), col("text"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH snap AS (SELECT doc_id, text, lang FROM documents),
      |log AS (
      |  SELECT doc_id, 1 AS seq, 'delete' AS op,
      |    CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS lang
      |  FROM snap WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id, 2, 'upsert', UPPER(text), lang
      |  FROM snap WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id + 5000000, 3, 'upsert', 'new:' || text, lang
      |  FROM snap WHERE doc_id % 11 = 0),
      |last AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY seq DESC, op DESC) AS rn
      |    FROM log) WHERE rn = 1),
      |kept AS (
      |  SELECT s.* FROM snap s
      |  WHERE s.doc_id NOT IN (SELECT doc_id FROM last))
      |SELECT doc_id, text, lang FROM kept
      |UNION ALL
      |SELECT doc_id, text, lang FROM last WHERE op = 'upsert'
      |ORDER BY doc_id""".stripMargin))

  /** SCD2 historization of a changelog: every upsert becomes a
    * version row with a validity interval [valid_from, valid_to) —
    * valid_to = the NEXT operation's seq on that key (any op closes
    * the predecessor; NULL = still current unless the closer was a
    * delete). One window (lead over the per-key seq order) — the
    * standard slowly-changing-dimension type-2 build, at changelog
    * (not snapshot) cost.
    */
  def scd2(changelog: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("seq"))
    changelog
      .withColumn("valid_to", lead(col("seq"), 1).over(w))
      .filter(col("op") === "upsert")
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed("seq", "valid_from")
      .drop("op")
  }

  /** Driver entry + FULL oracle: SCD2 over an organic multi-version
    * changelog — every doc gets version 1; doc_id % 5 = 0 gets a
    * version-2 rewrite (closing v1); doc_id % 7 = 0 gets a delete at
    * seq 3 (closing the latest version without opening a new one).
    */
  val scd2Entry: Q = Q("scd2_history",
    (s, d) => {
      Engine.configure(s)
      val snap = Engine.table(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val v1 = snap.select(col("doc_id"), lit(1L).as("seq"),
        lit("upsert").as("op"), col("text"))
      val v2 = snap.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), lit(2L).as("seq"), lit("upsert").as("op"),
          upper(col("text")).as("text"))
      val del = snap.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit(3L).as("seq"), lit("delete").as("op"),
          lit(null).cast("string").as("text"))
      scd2(v1.unionByName(v2).unionByName(del), "doc_id")
        .select(col("doc_id"), col("valid_from"), col("valid_to"),
          col("is_current"), col("text"))
        .orderBy(col("doc_id"), col("valid_from"))
    },
    Some("""WITH snap AS (SELECT doc_id, text FROM documents),
      |log AS (
      |  SELECT doc_id, 1 AS seq, 'upsert' AS op, text FROM snap
      |  UNION ALL
      |  SELECT doc_id, 2, 'upsert', UPPER(text)
      |  FROM snap WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id, 3, 'delete', CAST(NULL AS VARCHAR)
      |  FROM snap WHERE doc_id % 7 = 0),
      |v AS (
      |  SELECT doc_id, seq AS valid_from, op, text,
      |    LEAD(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
      |  FROM log)
      |SELECT doc_id, CAST(valid_from AS BIGINT) AS valid_from,
      |  CAST(valid_to AS BIGINT) AS valid_to,
      |  valid_to IS NULL AS is_current, text
      |FROM v WHERE op = 'upsert'
      |ORDER BY doc_id, valid_from""".stripMargin))

  val defs: Seq[Q] = Seq(mergeEntry, scd2Entry)
}
