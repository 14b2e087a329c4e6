package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compaction planning — the small-files answer every lakehouse table
  * needs: given a file manifest (path-ish key, size), assign files to
  * target-sized output bins so a rewrite job can coalesce them. The
  * plan is the running-sum bucketing: within each table partition,
  * order files deterministically, bin id = (cumulative size BEFORE
  * the file) div budget — every bin's total lands in
  * [budget - max_file + 1, budget + max_file) except the last, files
  * never split, and the whole plan is ONE window over the manifest
  * (manifests are ~10^6 rows for a 100 TB table — the plan costs
  * nothing next to the rewrite it schedules).
  */
object Compaction {

  /** `manifest`: (grpCol, fileCol, sizeCol). Returns per-file bin
    * assignments: grp, file, size, bin.
    */
  def planBins(manifest: DataFrame, grpCol: String, fileCol: String,
      sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, "planBins: budget > 0")
    val w = Window.partitionBy(col(grpCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest.withColumn("__cum", sum(col(sizeCol)).over(w))
      .select(col(grpCol).as("grp"), col(fileCol).as("file"),
        col(sizeCol).as("size"),
        expr(s"(__cum - $sizeCol) div ${budget}L").as("bin"))
  }

  /** Driver entry + FULL oracle: documents as the manifest (file =
    * doc_id, size = n_chars, partition = source), budget 2000 —
    * aggregated per (source, bin) so the checked surface is the whole
    * plan: bin populations, byte totals and file ranges.
    */
  val compactionEntry: Q = Q("layout_compaction",
    (s, d) => {
      Engine.configure(s)
      val manifest = Engine.table(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
      planBins(manifest, "source", "doc_id", "n_chars", budget = 2000L)
        .groupBy(col("grp"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("size")).as("bytes"),
          min(col("file")).as("first_file"), max(col("file")).as("last_file"))
        .orderBy(col("grp"), col("bin"))
    },
    Some("""WITH m AS (
      |  SELECT source AS grp, doc_id AS file, n_chars AS size,
      |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents),
      |b AS (SELECT grp, file, size, (cum - size) // 2000 AS bin FROM m)
      |SELECT grp, bin, COUNT(*) AS n_files,
      |  CAST(SUM(size) AS BIGINT) AS bytes,
      |  MIN(file) AS first_file, MAX(file) AS last_file
      |FROM b GROUP BY grp, bin
      |ORDER BY grp, bin""".stripMargin))

  val defs: Seq[Q] = Seq(compactionEntry)
}
