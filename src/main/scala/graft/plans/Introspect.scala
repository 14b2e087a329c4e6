package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's interactive-introspection surface: DESCRIBE (plain and
  * nested-type paths) and SHOW TABLES/DATABASES patterns, with Impala's
  * output shapes (`QueryTest/describe.test`, `show.test`;
  * `fe/src/main/java/org/apache/impala/service/DescribeResultFactory.java`,
  * `MetadataOp.java`).
  *
  * Routing lives here rather than in Catalyst because these are
  * metadata-result statements, not plans: the result is a small local
  * DataFrame built from the session catalog. Spark's own DESCRIBE output
  * (col_name/data_type/comment + section headers) differs from the
  * dialect's three-string-column shape, and Spark has no DESCRIBE of a
  * nested type path at all.
  */
object Introspect {

  /** Impala's type pretty-printer (`fe/.../catalog/StructType.java`
    * `prettyPrint`): structs expand one field per line with two-space
    * nesting indents; arrays and maps stay inline around them.
    */
  def impalaType(dt: DataType, indent: Int = 0): String = dt match {
    case s: StructType =>
      val pad = " " * (indent + 2)
      val fields = s.fields.map(f =>
        s"$pad${f.name}:${impalaType(f.dataType, indent + 2)}")
      s"struct<\n${fields.mkString(",\n")}\n${" " * indent}>"
    case a: ArrayType => s"array<${impalaType(a.elementType, indent)}>"
    case m: MapType =>
      s"map<${impalaType(m.keyType, indent)},${impalaType(m.valueType, indent)}>"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case TimestampType | TimestampNTZType => "timestamp"
    case other => other.catalogString
  }

  private val describeRe =
    "(?is)^describe\\s+(?!formatted\\b|extended\\b|history\\b|detail\\b|database\\b|function\\b|query\\b)([A-Za-z_][\\w.]*)\\s*;?\\s*$".r
  // SHOW PARTITIONS deliberately stays Spark's native single-column
  // shape (the existing insert/alter corpus pins it); the reference's
  // per-partition stats grid answers SHOW TABLE STATS
  private val showStatsRe =
    "(?is)^show\\s+table\\s+stats\\s+([\\w.]+)\\s*;?\\s*$".r
  private val descDbRe =
    "(?is)^describe\\s+database\\s+(extended\\s+)?([\\w]+)\\s*;?\\s*$".r
  private val showDataSrcRe =
    "(?is)^show\\s+data\\s+sources(?:\\s+(?:like\\s+)?'([^']*)')?\\s*;?\\s*$".r
  private val showFilesRe =
    ("(?is)^show\\s+files\\s+in\\s+([\\w.]+)" +
      "(?:\\s+partition\\s*\\(([^)]*)\\))?\\s*;?\\s*$").r
  private val showTablesRe =
    "(?is)^show\\s+tables(?:\\s+in\\s+([\\w.]+))?(?:\\s+(?:like\\s+)?(?:'([^']*)'|\"([^\"]*)\"))?\\s*;?\\s*$".r
  private val showDbsRe =
    "(?is)^show\\s+(?:databases|schemas)(?:\\s+(?:like\\s+)?(?:'([^']*)'|\"([^\"]*)\"))?\\s*;?\\s*$".r
  private val useRe = "(?is)^use\\s+([\\w]+)\\s*;?\\s*$".r

  /** Dialect route. Returns None when the statement is not ours (plain
    * Spark SQL, including DESCRIBE FORMATTED/EXTENDED which Spark's own
    * Hive-style output serves).
    */
  def route(spark: SparkSession, q: String): Option[DataFrame] = q match {
    case showStatsRe(table) => Some(tableStats(spark, table))
    case showFilesRe(table, spec) =>
      Some(showFiles(spark, table, Option(spec)))
    case descDbRe(_, db) => Some(describeDatabase(spark, db))
    case showDataSrcRe(pattern) =>
      Some(dataSources(spark, Option(pattern)))
    case describeRe(path) => Some(describe(spark, path))
    case showTablesRe(db, p1, p2) =>
      Some(showNames(spark, tableNames(spark, Option(db)),
        Option(p1).orElse(Option(p2))))
    case showDbsRe(p1, p2) =>
      Some(showNames(spark, spark.catalog.listDatabases().collect()
        .map(_.name).toSeq, Option(p1).orElse(Option(p2))))
    case useRe(db) =>
      // the dialect's USE switches the default database; fixture corpora
      // run in a single temp-view namespace, so an unknown database is a
      // successful no-op for table resolution, but the function catalog
      // tracks it for unqualified CREATE/SHOW FUNCTIONS
      if (spark.catalog.databaseExists(db)) spark.sql(s"use $db")
      graft.functions.FunctionDdl.setCurrentDb(spark, db)
      Some(spark.emptyDataFrame)
    case _ => None
  }

  /** Impala's SHOW pattern: '*' is a wildcard, '|' separates
    * alternatives, everything else is literal (regex metacharacters
    * match themselves), case-insensitive (`MetadataOp.java` pattern
    * conversion). An empty pattern matches nothing.
    */
  def patternMatches(pattern: String, name: String): Boolean =
    pattern.split("\\|").exists { alt =>
      val rx = alt.trim.toLowerCase.flatMap {
        case '*' => ".*"
        case c if "\\.[]{}()+-^$?".contains(c) => "\\" + c
        case c => c.toString
      }
      name.toLowerCase.matches(rx)
    }

  private def tableNames(spark: SparkSession, db: Option[String]): Seq[String] = {
    val dbName = db.map(_.split("\\.").last)
      .filter(spark.catalog.databaseExists)
    val listed = dbName match {
      case Some(d) => spark.catalog.listTables(d)
      case None => spark.catalog.listTables()
    }
    listed.collect().map(_.name.toLowerCase).toSeq.distinct.sorted
  }

  private def showNames(spark: SparkSession, names: Seq[String],
      pattern: Option[String]): DataFrame = {
    val kept = pattern match {
      case Some(p) => names.filter(patternMatches(p, _))
      case None => names
    }
    val schema = StructType(Seq(StructField("name", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(kept.map(Row(_)): _*), schema)
  }

  /** Impala's byte pretty-printer (`PrettyPrinter.java`): two decimals
    * at the largest fitting unit, whole bytes as `<n>B`.
    */
  def prettyBytes(b: Long): String =
    if (b < 1024) s"${b}B"
    else if (b < 1024L * 1024) f"${b / 1024.0}%.2fKB"
    else if (b < 1024L * 1024 * 1024) f"${b / 1024.0 / 1024.0}%.2fMB"
    else f"${b / 1024.0 / 1024.0 / 1024.0}%.2fGB"

  /** Per-location file stats: (#files, bytes, rows). Rows come from the
    * parquet FOOTERS — a metadata-only read, the same place the
    * reference's loaded-table stats live (`HdfsTable.java` per-partition
    * file descriptors); no data pages are scanned.
    */
  private def locStats(spark: SparkSession,
      location: java.net.URI): (Long, Long, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return (0L, 0L, 0L)
    val files = fs.listStatus(path).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    val bytes = files.map(_.getLen).sum
    val rows = files.collect {
      case f if f.getPath.getName.endsWith(".parquet") =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            f.getPath, conf))
        try reader.getRecordCount finally reader.close()
    }.sum
    (files.length.toLong, bytes, rows)
  }

  /** SHOW TABLE STATS / SHOW PARTITIONS: the reference's per-partition
    * stats grid (`show-stats.test` — keys, #Rows, #Files, Size, format,
    * location, plus a Total row). Row counts are real (parquet footer
    * metadata), not scans; cache columns are NOT CACHED (no HDFS cache
    * here).
    */
  def tableStats(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val catalog = spark.sessionState.catalog
    val parts = table.split("\\.")
    val ident =
      if (parts.length >= 2) TableIdentifier(parts.last, Some(parts.head))
      else TableIdentifier(parts.head)
    val meta = catalog.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    val fmt = meta.provider.getOrElse("parquet").toUpperCase
    val fixed = Seq("#Rows", "#Files", "Size", "Bytes Cached",
      "Cache Replication", "Format", "Incremental stats", "Location")
    val schema = StructType(
      partCols.map(c => StructField(c, StringType)) ++ fixed.map {
        case c @ ("#Rows" | "#Files") => StructField(c, LongType)
        case c => StructField(c, StringType)
      })
    // "Incremental stats" reads back per-partition catalog-stats
    // presence — the state COMPUTE INCREMENTAL STATS maintains and
    // DROP [INCREMENTAL] STATS clears (compute-stats-incremental.test)
    def statRow(keys: Seq[String], loc: Option[java.net.URI],
        incr: Boolean): Row = {
      val (nf, bytes, rows) = loc.map(locStats(spark, _)).getOrElse((0L, 0L, 0L))
      Row.fromSeq(keys ++ Seq(rows, nf, prettyBytes(bytes), "NOT CACHED",
        "NOT CACHED", fmt, incr.toString, loc.map(_.toString).getOrElse("")))
    }
    val rows =
      if (partCols.isEmpty)
        Seq(statRow(Nil, meta.storage.locationUri, meta.stats.isDefined))
      else {
        val partRows = catalog.listPartitions(ident).map { p =>
          statRow(partCols.map(c => p.spec.getOrElse(c, "")),
            p.storage.locationUri, p.stats.isDefined)
        }
        val totRows = partRows.map(_.getLong(partCols.size)).sum
        val totFiles = partRows.map(_.getLong(partCols.size + 1)).sum
        // Size columns are pretty-printed, so total bytes recompute
        // from the partition locations
        val totalBytes = catalog.listPartitions(ident).map(p =>
          p.storage.locationUri.map(locStats(spark, _)._2).getOrElse(0L)).sum
        partRows :+ Row.fromSeq(
          Seq("Total") ++ Seq.fill(partCols.size - 1)("") ++
            Seq(totRows, totFiles, prettyBytes(totalBytes), "0B", "", "",
              "", ""))
      }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** `SHOW FILES IN t [PARTITION (spec)]` — the reference's
    * Path/Size/Partition file listing (`ShowFilesStmt.java`,
    * `HdfsTable.getFiles`: partitions sorted, visible files per
    * partition sorted, sizes pretty-printed; `show.test:216-259`).
    */
  def showFiles(spark: SparkSession, table: String,
      partSpec: Option[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val catalog = spark.sessionState.catalog
    val parts0 = table.split("\\.")
    val ident =
      if (parts0.length >= 2) TableIdentifier(parts0.last, Some(parts0.head))
      else TableIdentifier(parts0.head)
    val meta = catalog.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    def specOf(raw: String): Map[String, String] =
      raw.split(",").map { kv =>
        val Array(k, v) = kv.split("=", 2).map(_.trim)
        val vv = v.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
        k -> (if (vv.equalsIgnoreCase("NULL")) "__HIVE_DEFAULT_PARTITION__"
          else vv)
      }.toMap
    val targets: Seq[(Option[java.net.URI], String)] =
      if (partCols.isEmpty) Seq((meta.storage.locationUri, ""))
      else {
        val ps = partSpec match {
          case Some(raw) => Seq(catalog.getPartition(ident, specOf(raw)))
          case None => catalog.listPartitions(ident)
            .sortBy(p => partCols.map(c => p.spec.getOrElse(c, "")).mkString("/"))
        }
        ps.map(p => (p.storage.locationUri,
          partCols.map(c => s"$c=${p.spec.getOrElse(c, "")}").mkString("/")))
      }
    val conf = spark.sessionState.newHadoopConf()
    val rows = targets.flatMap { case (loc, partStr) =>
      loc.toSeq.flatMap { uri =>
        val path = new org.apache.hadoop.fs.Path(uri)
        val fs = path.getFileSystem(conf)
        if (!fs.exists(path)) Nil
        else fs.listStatus(path).filter(f => f.isFile &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
          .map(f => Row(f.getPath.toString, prettyBytes(f.getLen), partStr))
          .toSeq
      }
    }
    val schema = StructType(Seq(
      StructField("Path", StringType), StructField("Size", StringType),
      StructField("Partition", StringType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** DESCRIBE DATABASE [EXTENDED] (`describedb.test`): one
    * name/location/comment row from the session catalog.
    */
  def describeDatabase(spark: SparkSession, db: String): DataFrame = {
    val d = spark.sessionState.catalog.getDatabaseMetadata(db)
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("location", StringType),
      StructField("comment", StringType)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(d.name, d.locationUri.toString, d.description)), schema)
  }

  /** SHOW DATA SOURCES [LIKE 'pat'] (`show-data-sources.test`): the
    * engine's registered external data sources — its DSv2 classes, the
    * analog of the reference's ExternalDataSource registry.
    */
  def dataSources(spark: SparkSession, pattern: Option[String]): DataFrame = {
    val sources = Seq(
      ("alltypes", "builtin", "graft.sources.AllTypesSource", "V2"),
      ("kv_range", "builtin", "graft.sources.KvRangeSource", "V2"),
      ("kv_store", "builtin", "graft.sources.KvStoreSink", "V2")) ++
      graft.sources.DataSourceDdl.listCreated(spark)
    val kept = sources.filter(s =>
      pattern.forall(p => patternMatches(p, s._1)))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("location", StringType),
      StructField("class name", StringType),
      StructField("api version", StringType)))
    spark.createDataFrame(java.util.Arrays.asList(
      kept.map(s => Row(s._1, s._2, s._3, s._4)): _*), schema)
  }

  /** DESCRIBE <table>[.<col or field path>...]: the three-string-column
    * result. A path into a collection type describes the collection's
    * item/pos (arrays), key/value (maps) or fields (structs) exactly as
    * the reference's DescribeResultFactory renders them.
    */
  def describe(spark: SparkSession, path: String): DataFrame = {
    val parts = path.split("\\.").toSeq
    // longest prefix of parts that resolves as a table/view name; the
    // dialect's db prefixes were dropped at corpus-port time, so try the
    // first segment, then first two (db.table)
    val (schema0, rest) =
      try (spark.table(parts.head).schema, parts.tail)
      catch {
        case _: Exception if parts.length >= 2 =>
          (spark.table(parts.take(2).mkString(".")).schema, parts.drop(2))
      }
    var fields: Seq[(String, DataType, String)] = schema0.fields.toSeq.map(
      f => (f.name, f.dataType,
        f.getComment().getOrElse("")))
    var cursor: Option[DataType] = None
    rest.foreach { seg =>
      val dt = cursor match {
        case None =>
          fields.find(_._1.equalsIgnoreCase(seg)).map(_._2).getOrElse(
            throw new IllegalArgumentException(
              s"Could not resolve path: '$path'"))
        case Some(st: StructType) =>
          st.fields.find(_.name.equalsIgnoreCase(seg)).map(_.dataType)
            .getOrElse(throw new IllegalArgumentException(
              s"Could not resolve path: '$path'"))
        case Some(a: ArrayType) if seg.equalsIgnoreCase("item") =>
          a.elementType
        case Some(m: MapType) if seg.equalsIgnoreCase("key") => m.keyType
        case Some(m: MapType) if seg.equalsIgnoreCase("value") => m.valueType
        case _ => throw new IllegalArgumentException(
          s"Could not resolve path: '$path'")
      }
      cursor = Some(dt)
    }
    cursor.foreach { dt =>
      fields = dt match {
        case st: StructType =>
          st.fields.toSeq.map(f => (f.name, f.dataType, ""))
        case a: ArrayType => a.elementType match {
          // an array of structs describes as the struct's fields + pos
          case st: StructType =>
            st.fields.toSeq.map(f => (f.name, f.dataType, "")) :+
              (("pos", LongType: DataType, ""))
          case elem => Seq(("item", elem, ""), ("pos", LongType, ""))
        }
        case m: MapType =>
          Seq(("key", m.keyType, ""), ("value", m.valueType, ""))
        case prim => Seq((parts.last, prim, ""))
      }
    }
    val out = StructType(Seq(
      StructField("name", StringType), StructField("type", StringType),
      StructField("comment", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(fields.map { case (n, t, c) =>
        Row(n, impalaType(t), c)
      }: _*), out)
  }
}
