package graft.sources

import graft.{Engine, Q}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Per-partition file formats inside one table.
  *
  * The reference's `HdfsTable` keeps a file format on each PARTITION, not
  * on the table (`HdfsPartitionDescriptor` carries its own
  * `THdfsFileFormat` — `be/src/runtime/descriptors.h:223`,
  * `fe/src/main/java/com/cloudera/impala/catalog/HdfsPartition.java`), and
  * the scan node instantiates the right scanner per split
  * (`be/src/exec/hdfs-scan-node.cc` per-format scanner dispatch;
  * conformance: `QueryTest/mixed-format.test` reads a table whose months
  * are TEXT / SEQFILE / RC).
  *
  * Spark's file sources assume one format per table, so this models the
  * catalog side explicitly: a manifest maps each partition value to its
  * format, the reader plans ONE distributed scan per partition with that
  * partition's DataSource, injects the partition-key column (the
  * reference materializes partition keys from the descriptor, not the
  * data files), and unions the scans. Union is narrow — no shuffle — so
  * the plan is exactly N format-specific scans feeding the parent, the
  * same shape the reference's scan node produces.
  *
  * Partition pruning happens against the MANIFEST before any scan is
  * planned (the FE prunes partitions against the descriptor list in
  * `HdfsScanNode.java`) — a pruned partition contributes no scan at all,
  * regardless of format.
  */
object MixedFormat {

  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  /** format name -> (reader options, writer options) honoring the text
    * formats' need for headers/explicit schema.
    */
  private def provider(fmt: String): String = fmt match {
    case "avro" => AvroProvider
    case other => other
  }

  final case class Partition(value: String, format: String)

  /** The manifest — partition value -> file format. Persisted next to the
    * data as one JSON line per partition (the catalog descriptor analog;
    * tiny, driver-side, like the reference's partition metadata in the
    * catalogd).
    */
  def writeManifest(spark: SparkSession, dir: String,
      parts: Seq[Partition]): Unit = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(dir))
    val lines = parts.map(p => s"""{"value":"${p.value}","format":"${p.format}"}""")
    Files.write(Paths.get(dir, "_partition_formats.json"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  def readManifest(dir: String): Seq[Partition] = {
    val p = java.nio.file.Paths.get(dir, "_partition_formats.json")
    if (!java.nio.file.Files.exists(p)) return Seq.empty
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .linesIterator.filter(_.nonEmpty).map { l =>
        // two fixed keys, written by writeManifest above
        val m = """"(value|format)":"([^"]*)"""".r
          .findAllMatchIn(l).map(g => g.group(1) -> g.group(2)).toMap
        Partition(m("value"), m("format"))
      }.toSeq
  }

  /** Split `df` by `partCol` and write each partition in its assigned
    * format (cycling through `formats`), plus the manifest. One job per
    * partition — this is the fixture/ETL side; the operator under test is
    * the read path.
    */
  def writeMixed(spark: SparkSession, df: DataFrame, dir: String,
      partCol: String, formats: Seq[String]): Seq[Partition] = {
    val values = df.select(partCol).distinct()
      .collect().map(_.get(0).toString).sorted
    val parts = values.zipWithIndex.map { case (v, i) =>
      Partition(v, formats(i % formats.size))
    }
    parts.foreach { p =>
      val slice = df.filter(col(partCol) === p.value).drop(partCol)
      val w = slice.write.mode(SaveMode.Overwrite).format(provider(p.format))
      val w2 = if (p.format == "csv") w.option("header", "true") else w
      w2.save(s"$dir/$partCol=${p.value}")
    }
    writeManifest(spark, dir, parts.toSeq)
    parts.toSeq
  }

  /** Read the mixed-format table: one format-dispatched distributed scan
    * per surviving partition, partition key injected from the manifest,
    * narrow union on top. `partitionFilter` prunes against the manifest
    * BEFORE planning — pruned partitions never become scans.
    */
  def read(spark: SparkSession, dir: String, dataSchema: StructType,
      partCol: String,
      partitionFilter: String => Boolean = _ => true): DataFrame = {
    val parts = readManifest(dir).filter(p => partitionFilter(p.value))
    require(parts.nonEmpty, s"no partitions survive pruning in $dir")
    parts.map { p =>
      val r = spark.read.format(provider(p.format)).schema(dataSchema)
      val r2 = if (p.format == "csv") r.option("header", "true") else r
      r2.load(s"$dir/$partCol=${p.value}")
        .withColumn(partCol, lit(p.value))
    }.reduce(_.unionAll(_))
  }

  /** Number of partitions the manifest would plan for a filter — exposed
    * so tests can assert metadata-only pruning.
    */
  def plannedPartitions(dir: String, f: String => Boolean): Int =
    readManifest(dir).count(p => f(p.value))

  // ---- driver-gated query -------------------------------------------------

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_fmt_$name"

  /** Mixed-format scan parity (`QueryTest/mixed-format.test`): customer
    * partitioned by market segment, partitions cycling through
    * csv / parquet / json / avro; the aggregate must be transparent to
    * the per-partition format (the reference's test sums across its
    * TEXT+SEQ+RC months). The oracle recomputes from the parquet source,
    * so any per-format encode/decode loss breaks the hash.
    */
  val mixedScan: Q = Q("scan_mixed_format",
    (s, d) => {
      Engine.configure(s)
      val src = Engine.table(s, d, "customer")
      val dir = tmp("customer_mixed")
      writeMixed(s, src, dir, "c_mktsegment",
        Seq("csv", "parquet", "json", "avro"))
      val dataSchema = StructType(src.schema.filterNot(_.name == "c_mktsegment"))
      read(s, dir, dataSchema, "c_mktsegment")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), graft.Det.dsum2(col("c_acctbal")).as("bal"),
          max(col("c_custkey")).as("max_key"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
      |  ${graft.Det.oSum2("c_acctbal")} AS bal,
      |  MAX(c_custkey) AS max_key
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  val defs: Seq[Q] = Seq(mixedScan)
}
