package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.types._

/** The reference's catalog-operation statement surface: COMPUTE
  * [INCREMENTAL] STATS / DROP STATS (`ComputeStatsStmt.java`,
  * `QueryTest/compute-stats.test`), SHOW COLUMN STATS
  * (`ShowStatsStmt.java`), LOAD DATA INPATH (`LoadDataStmt.java`,
  * `Frontend.java:528-577`, `QueryTest/load.test`) and REFRESH /
  * INVALIDATE METADATA (`Frontend.java` catalog-op path).
  *
  * Mapping to Spark: COMPUTE STATS drives `ANALYZE TABLE ... COMPUTE
  * STATISTICS [FOR ALL COLUMNS]` (plus the per-partition row-count pass
  * for partitioned tables) and answers with the reference's one-row
  * summary ("Updated N partition(s) and M column(s)."); DROP STATS
  * clears the catalog entries Spark wrote; LOAD DATA is the reference's
  * exact file-move protocol (stage into a tmp subdir, optional
  * overwrite-delete, move into place, report "Loaded n file(s). Total
  * files in destination location: t"); REFRESH maps to
  * `spark.catalog.refreshTable`.
  */
object CatalogOps {

  private val computeStatsRe =
    "(?is)^compute\\s+stats\\s+([\\w.]+)\\s*;?\\s*$".r
  private val computeIncrRe =
    ("(?is)^compute\\s+incremental\\s+stats\\s+([\\w.]+)" +
      "(?:\\s+partition\\s*\\(([^)]*)\\))?\\s*;?\\s*$").r
  private val dropStatsRe =
    ("(?is)^drop\\s+(?:incremental\\s+)?stats\\s+([\\w.]+)" +
      "(?:\\s+partition\\s*\\(([^)]*)\\))?\\s*;?\\s*$").r
  private val showColStatsRe =
    "(?is)^show\\s+column\\s+stats\\s+([\\w.]+)\\s*;?\\s*$".r
  private val loadDataRe =
    ("(?is)^load\\s+data\\s+(?:local\\s+)?inpath\\s+'([^']+)'\\s+" +
      "(overwrite\\s+)?into\\s+table\\s+([\\w.]+)" +
      "(?:\\s+partition\\s*\\(([^)]*)\\))?\\s*;?\\s*$").r
  // the dialect's bare `REFRESH t`; `REFRESH TABLE t` / `REFRESH
  // FUNCTION f` are Spark-native and fall through
  private val refreshRe =
    "(?is)^refresh\\s+(?!table\\b|function\\b)([\\w.]+)\\s*;?\\s*$".r
  private val invalidateRe =
    "(?is)^invalidate\\s+metadata(?:\\s+([\\w.]+))?\\s*;?\\s*$".r

  def route(spark: SparkSession, q: String): Option[DataFrame] = q match {
    case computeStatsRe(t) =>
      Some(computeStats(spark, t, None, incremental = false))
    case computeIncrRe(t, spec) =>
      Some(computeStats(spark, t, Option(spec), incremental = true))
    case dropStatsRe(t, spec) => Some(dropStats(spark, t, Option(spec)))
    case showColStatsRe(t) => Some(columnStats(spark, t))
    case loadDataRe(path, ow, t, spec) =>
      Some(loadData(spark, path, ow != null, t, Option(spec)))
    case refreshRe(t) =>
      spark.catalog.refreshTable(t)
      Some(spark.emptyDataFrame)
    case invalidateRe(t) =>
      Option(t) match {
        case Some(table) => spark.catalog.refreshTable(table)
        case None =>
          // global invalidation: drop every cached relation + file
          // listing (the closest Spark analog of a full catalog reload)
          spark.catalog.clearCache()
          spark.sessionState.catalog.listTables("default")
            .foreach(t => spark.sessionState.catalog.refreshTable(t))
      }
      Some(spark.emptyDataFrame)
    case _ => None
  }

  private def ident(table: String): TableIdentifier = {
    val parts = table.split("\\.")
    if (parts.length >= 2) TableIdentifier(parts.last, Some(parts.head))
    else TableIdentifier(parts.head)
  }

  private def oneStringRow(spark: SparkSession, col: String,
      value: String): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(value)),
      StructType(Seq(StructField(col, StringType))))

  /** `COMPUTE [INCREMENTAL] STATS t [PARTITION (spec)]`: row counts
    * (table + per-partition) and column NDVs through ANALYZE, then the
    * reference's summary row (`CatalogOpExecutor.java:593`). The
    * updated-column count is the data-column count, as in the reference
    * (partition keys are metadata-derived there, not scanned).
    *
    * The INCREMENTAL form without a partition spec recomputes ONLY the
    * partitions missing incremental stats (the reference's
    * `compute-stats-incremental.test` contract: after a fresh compute,
    * dropping one partition's stats and re-running reports "Updated 1
    * partition(s)"); a partition's "has incremental stats" state is its
    * catalog stats presence, which SHOW TABLE STATS reads back.
    */
  private def computeStats(spark: SparkSession, table: String,
      partSpec: Option[String], incremental: Boolean): DataFrame = {
    val catalog = spark.sessionState.catalog
    if (catalog.getTempView(table).isDefined)
      throw new IllegalArgumentException(
        s"COMPUTE STATS not supported for view: $table")
    val meta = catalog.getTableMetadata(ident(table))
    val partCols = meta.partitionColumnNames
    val nDataCols = meta.schema.fields.length - partCols.size
    def summary(n: Long): DataFrame = oneStringRow(spark, "summary",
      s"Updated $n partition(s) and $nDataCols column(s).")
    partSpec match {
      case Some(spec) =>
        // the per-partition form: only that partition's stats recompute
        spark.sql(s"ANALYZE TABLE $table PARTITION ($spec) COMPUTE STATISTICS")
        summary(1)
      case None if incremental && partCols.nonEmpty =>
        val all = catalog.listPartitions(ident(table))
        val missing = all.filter(_.stats.isEmpty)
        if (missing.size == all.size && all.nonEmpty)
          // everything is stale: ONE batched scan over the table (the
          // reference's many-partitions case — 1234 partitions must not
          // become 1234 jobs, compute-stats-many-partitions.test)
          spark.sql(s"ANALYZE TABLE $table PARTITION " +
            s"(${partCols.mkString(", ")}) COMPUTE STATISTICS")
        else missing.foreach { p =>
          val spec = partCols.map(c => s"$c='${p.spec(c)}'").mkString(", ")
          spark.sql(s"ANALYZE TABLE $table PARTITION ($spec) COMPUTE STATISTICS")
        }
        spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
        spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")
        summary(missing.size.toLong)
      case None =>
        if (partCols.nonEmpty)
          spark.sql(s"ANALYZE TABLE $table PARTITION " +
            s"(${partCols.mkString(", ")}) COMPUTE STATISTICS")
        spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
        spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")
        val nParts =
          if (partCols.isEmpty) 1L
          else catalog.listPartitions(ident(table)).size.toLong
        summary(nParts)
    }
  }

  /** `DROP [INCREMENTAL] STATS t [PARTITION (spec)]`: clear the catalog
    * stats ANALYZE wrote (table-level row count + column stats, and the
    * per-partition row counts). The reference returns no result set.
    */
  private def dropStats(spark: SparkSession, table: String,
      partSpec: Option[String]): DataFrame = {
    val catalog = spark.sessionState.catalog
    val id = ident(table)
    partSpec match {
      case Some(spec) =>
        val specMap = parseSpec(spec)
        val p = catalog.getPartition(id, specMap)
        catalog.alterPartitions(id, Seq(p.copy(stats = None)))
      case None =>
        catalog.alterTableStats(id, None)
        val meta = catalog.getTableMetadata(id)
        if (meta.partitionColumnNames.nonEmpty) {
          val parts = catalog.listPartitions(id)
          if (parts.exists(_.stats.isDefined))
            catalog.alterPartitions(id,
              parts.filter(_.stats.isDefined).map(_.copy(stats = None)))
        }
    }
    spark.emptyDataFrame
  }

  /** Impala's fixed in-memory slot widths per type
    * (`ColumnStats.java`): what SHOW COLUMN STATS prints for
    * fixed-length types with or without stats.
    */
  private def fixedSize(dt: DataType): Int = dt match {
    case BooleanType | ByteType => 1
    case ShortType => 2
    case IntegerType | FloatType | DateType => 4
    case LongType | DoubleType => 8
    case TimestampType | TimestampNTZType => 16
    case d: DecimalType =>
      if (d.precision <= 9) 4 else if (d.precision <= 18) 8 else 16
    case _ => -1
  }

  /** `SHOW COLUMN STATS t` — the reference's grid (COLUMN, TYPE,
    * #DISTINCT VALUES, #NULLS, MAX SIZE, AVG SIZE;
    * `compute-stats.test`). NDVs come from the column stats ANALYZE
    * wrote (-1 when absent); partition-key NDV/#NULLS derive from the
    * partition metadata as in the reference ("the NDV for partition
    * columns is read from the table metadata"); #NULLS is -1 for data
    * columns (the reference does not compute null counts).
    */
  private def columnStats(spark: SparkSession, table: String): DataFrame = {
    val catalog = spark.sessionState.catalog
    val meta = catalog.getTableMetadata(ident(table))
    val partCols = meta.partitionColumnNames.toSet
    val colStats = meta.stats.map(_.colStats).getOrElse(Map.empty)
    val partVals: Map[String, (Long, Long)] =
      if (partCols.isEmpty) Map.empty
      else {
        val parts = catalog.listPartitions(ident(table))
        partCols.map { c =>
          val vals = parts.map(_.spec.getOrElse(c, null))
          c -> (vals.distinct.size.toLong,
            vals.count(v => v == null ||
              v == "__HIVE_DEFAULT_PARTITION__").toLong)
        }.toMap
      }
    val rows = meta.schema.fields.toSeq.map { f =>
      val (ndv, nulls, maxS, avgS) =
        if (partCols.contains(f.name)) {
          val (d, n) = partVals(f.name)
          (d, n, fixedSize(f.dataType),
            fixedSize(f.dataType).toDouble)
        } else colStats.get(f.name) match {
          case Some(s) =>
            val ndv = s.distinctCount.map(_.toLong).getOrElse(-1L)
            val fixed = fixedSize(f.dataType)
            val mx =
              if (fixed >= 0) fixed
              else s.maxLen.map(_.toInt).getOrElse(-1)
            val av =
              if (fixed >= 0) fixed.toDouble
              else s.avgLen.map(_.toDouble).getOrElse(-1.0)
            (ndv, -1L, mx, av)
          case None =>
            val fixed = fixedSize(f.dataType)
            (-1L, -1L, fixed, fixed.toDouble)
        }
      Row(f.name, Introspect.impalaType(f.dataType).toUpperCase,
        ndv, nulls, maxS, avgS)
    }
    val schema = StructType(Seq(
      StructField("Column", StringType), StructField("Type", StringType),
      StructField("#Distinct Values", LongType),
      StructField("#Nulls", LongType),
      StructField("Max Size", IntegerType),
      StructField("Avg Size", DoubleType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private def parseSpec(spec: String): Map[String, String] =
    spec.split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2).map(_.trim)
      k -> v.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")
    }.toMap

  /** `LOAD DATA [LOCAL] INPATH 'p' [OVERWRITE] INTO TABLE t
    * [PARTITION (spec)]` — the reference's file-move ingestion
    * (`Frontend.java:528-577`): stage the source's visible files into a
    * tmp subdirectory of the destination, delete existing visible files
    * when OVERWRITE, move the staged files into place (UUID-renaming on
    * name conflicts, `FileSystemUtil.java:111`), report the loaded-file
    * summary. The destination is the partition location when a spec is
    * given, else the table location; the target table's cached listing
    * refreshes so subsequent reads see the moved files.
    */
  private def loadData(spark: SparkSession, source: String,
      overwrite: Boolean, table: String,
      partSpec: Option[String]): DataFrame = {
    val catalog = spark.sessionState.catalog
    val id = ident(table)
    val destUri = partSpec match {
      case Some(spec) =>
        catalog.getPartition(id, parseSpec(spec)).location
      case None => catalog.getTableMetadata(id).location
    }
    val conf = spark.sessionState.newHadoopConf()
    val dest = new org.apache.hadoop.fs.Path(destUri)
    val fs = dest.getFileSystem(conf)
    val src = new org.apache.hadoop.fs.Path(source)
    val srcFs = src.getFileSystem(conf)
    if (!srcFs.exists(src))
      throw new IllegalArgumentException(s"INPATH location '$source' " +
        "does not exist.")
    def visible(p: org.apache.hadoop.fs.Path) =
      if (!fs.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(p).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
    if (!fs.exists(dest)) fs.mkdirs(dest) // empty table: location may not exist yet
    // stage into a tmp subdir of the destination (the reference's
    // protocol: the load survives a concurrent overwrite-delete)
    val tmp = new org.apache.hadoop.fs.Path(dest,
      s".tmp_load_${java.util.UUID.randomUUID().toString}")
    fs.mkdirs(tmp)
    val sources =
      if (srcFs.getFileStatus(src).isDirectory) visible(src).toSeq else {
        Seq(srcFs.getFileStatus(src))
      }
    sources.foreach(f =>
      fs.rename(f.getPath, new org.apache.hadoop.fs.Path(tmp, f.getPath.getName)))
    if (overwrite) visible(dest).foreach(f => fs.delete(f.getPath, false))
    val existing = visible(dest).map(_.getPath.getName).toSet
    visible(tmp).foreach { f =>
      val name =
        if (!existing.contains(f.getPath.getName)) f.getPath.getName
        else {
          val uuid = java.util.UUID.randomUUID().toString
          s"${f.getPath.getName}_$uuid"
        }
      fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dest, name))
    }
    fs.delete(tmp, true)
    spark.catalog.refreshTable(table)
    oneStringRow(spark, "summary",
      s"Loaded ${sources.size} file(s). Total files in destination " +
        s"location: ${visible(dest).length}")
  }
}
