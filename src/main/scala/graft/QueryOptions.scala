package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's per-query option surface (`SET [k=v]`), from
  * `common/thrift/ImpalaService.thrift:32-165` (TImpalaQueryOptions) and
  * the shell's option printing (`shell/impala_shell.py` `_print_options`;
  * conformance corpus `QueryTest/set.test`).
  *
  * Options whose semantics have a Spark session analog APPLY it (the
  * mapping is documented per option below); the rest are recorded and
  * listed faithfully — their reference semantics are cluster/admission
  * concerns that Spark owns at a different layer (executor sizing, YARN
  * pools), which is a documented divergence, not a stub: SET/listing
  * behavior, value parsing and validation errors match the reference.
  *
  * Value parsing follows the reference: booleans accept 0/1/true/false
  * (rendered 0/1), byte sizes accept ints or float+M/G suffixes
  * (set.test's `1.5g` -> 1610612736), PARQUET_FILE_SIZE enforces the
  * < 2 GB cap with the reference's message (IMPALA-1906), unknown
  * options and invalid codecs raise the reference's errors.
  */
object QueryOptions {

  /** name -> default (the set.test listing, enum order irrelevant:
    * comparisons sort).
    */
  private val defaults: Seq[(String, String)] = Seq(
    "ABORT_ON_DEFAULT_LIMIT_EXCEEDED" -> "0",
    "ABORT_ON_ERROR" -> "0",
    "ALLOW_UNSUPPORTED_FORMATS" -> "0",
    "APPX_COUNT_DISTINCT" -> "0",
    "BATCH_SIZE" -> "0",
    "COMPRESSION_CODEC" -> "NONE",
    "DEBUG_ACTION" -> "",
    "DEFAULT_ORDER_BY_LIMIT" -> "-1",
    "DISABLE_CACHED_READS" -> "0",
    "DISABLE_CODEGEN" -> "0",
    "DISABLE_OUTERMOST_TOPN" -> "0",
    "EXPLAIN_LEVEL" -> "1",
    "HBASE_CACHE_BLOCKS" -> "0",
    "HBASE_CACHING" -> "0",
    "MAX_ERRORS" -> "0",
    "MAX_IO_BUFFERS" -> "0",
    "MAX_SCAN_RANGE_LENGTH" -> "0",
    "MEM_LIMIT" -> "0",
    "NUM_NODES" -> "0",
    "NUM_SCANNER_THREADS" -> "0",
    "PARQUET_FILE_SIZE" -> "0",
    "QUERY_TIMEOUT_S" -> "0",
    "REQUEST_POOL" -> "",
    "RESERVATION_REQUEST_TIMEOUT" -> "0",
    "RM_INITIAL_MEM" -> "0",
    "SYNC_DDL" -> "0",
    "V_CPU_CORES" -> "0")

  /** PARQUET_COMPRESSION_CODEC predates COMPRESSION_CODEC (set.test
    * uses both).
    */
  private val aliases = Map("PARQUET_COMPRESSION_CODEC" -> "COMPRESSION_CODEC")

  private val known = defaults.map(_._1).toSet

  private val state =
    PerSession.map[scala.collection.concurrent.TrieMap[String, String]]()

  private def sessionState(spark: SparkSession) =
    state.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap(defaults: _*))

  /** The deferred writer-codec rejection: Some(codec) when the session's
    * COMPRESSION_CODEC is a valid HDFS codec the parquet writer cannot
    * use (bzip2/deflate/lzo) — the error the reference raises when a
    * parquet write executes, not at SET time.
    */
  def parquetWriterCodecError(spark: SparkSession): Option[String] = {
    val c = get(spark, "COMPRESSION_CODEC")
    if (hdfsOnlyCodecs.contains(c)) Some(c.toLowerCase) else None
  }

  def isOption(key: String): Boolean = {
    val k = key.toUpperCase
    known.contains(k) || aliases.contains(k)
  }

  def get(spark: SparkSession, key: String): String =
    sessionState(spark)(aliases.getOrElse(key.toUpperCase, key.toUpperCase))

  /** The bare `SET` listing: (OPTION, VALUE) like the reference shell. */
  def list(spark: SparkSession): DataFrame = {
    val s = sessionState(spark)
    import spark.implicits._
    defaults.map { case (k, _) => (k, s(k)) }.toDF("OPTION", "VALUE")
  }

  private def parseBool(key: String, v: String): String =
    v.trim.toLowerCase match {
      case "1" | "true" => "1"
      case "0" | "false" => "0"
      case other => throw new IllegalArgumentException(
        s"Invalid boolean value for $key: $other")
    }

  /** Int-or-float+M/G byte sizes (the reference's MEM_LIMIT /
    * PARQUET_FILE_SIZE grammar, ImpalaService.thrift:46-51).
    */
  private def parseBytes(key: String, v: String): Long = {
    val t = v.trim.toLowerCase
    val (num, mult) =
      if (t.endsWith("g") || t.endsWith("gb"))
        (t.stripSuffix("gb").stripSuffix("g"), 1024L * 1024 * 1024)
      else if (t.endsWith("m") || t.endsWith("mb"))
        (t.stripSuffix("mb").stripSuffix("m"), 1024L * 1024)
      else (t, 1L)
    try (BigDecimal(num) * mult).toLong
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"Invalid $key: $v")
    }
  }

  private val parquetCodecs =
    Map("NONE" -> "uncompressed", "DEFAULT" -> "snappy",
      "SNAPPY" -> "snappy", "GZIP" -> "gzip")

  /** Valid THdfsCompression enum values the parquet writer nevertheless
    * rejects (the reference errors at write time —
    * `hdfs-parquet-table-writer.cc` codec switch,
    * `insert_parquet_invalid_codec.test`).
    */
  private val hdfsOnlyCodecs = Set("BZIP2", "DEFLATE", "LZO")

  /** SET key=value with the reference's validation + the Spark-session
    * side effect where one exists.
    */
  def set(spark: SparkSession, key: String, rawValue: String): Unit = {
    val k = aliases.getOrElse(key.toUpperCase, key.toUpperCase)
    if (!known.contains(k))
      throw new IllegalArgumentException(
        s"Ignoring invalid configuration option: ${key.toLowerCase}")
    val v = rawValue.trim.stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
    val stored: String = k match {
      case "COMPRESSION_CODEC" =>
        val up = v.toUpperCase
        if (hdfsOnlyCodecs.contains(up)) {
          // a valid THdfsCompression value the parquet writer cannot
          // use: the reference ACCEPTS the SET and errors only when an
          // insert reaches the writer (insert_parquet_invalid_codec
          // .test) — store it; Engine raises from the write path
          up
        } else {
          val codec = parquetCodecs.getOrElse(up, throw
            new IllegalArgumentException(s"Invalid compression codec: $v"))
          // hdfs-parquet-table-writer codec selection -> Spark's writer conf
          spark.conf.set("spark.sql.parquet.compression.codec", codec)
          up
        }
      case "PARQUET_FILE_SIZE" =>
        val bytes = parseBytes(k, v)
        // the reference caps the row-group size below 2GB (IMPALA-1906)
        if (bytes >= 2L * 1024 * 1024 * 1024)
          throw new IllegalArgumentException(
            "The PARQUET_FILE_SIZE query option must be less than 2GB.")
        // parquet.block.size rides the session conf into the writer's
        // hadoop conf; 0 restores the default
        if (bytes > 0) spark.conf.set("parquet.block.size", bytes.toString)
        else spark.conf.unset("parquet.block.size")
        bytes.toString
      case "DISABLE_CODEGEN" =>
        val b = parseBool(k, v)
        // llvm codegen toggle -> whole-stage codegen toggle
        spark.conf.set("spark.sql.codegen.wholeStage",
          (b == "0").toString)
        b
      case "BATCH_SIZE" =>
        val n = parseBytes(k, v)
        // RowBatch capacity -> the vectorized reader's batch rows
        if (n > 0)
          spark.conf.set("spark.sql.parquet.columnarReaderBatchSize",
            n.toString)
        else spark.conf.unset("spark.sql.parquet.columnarReaderBatchSize")
        n.toString
      case "MAX_SCAN_RANGE_LENGTH" =>
        val n = parseBytes(k, v)
        // scan-range length -> file-split length
        if (n > 0)
          spark.conf.set("spark.sql.files.maxPartitionBytes", n.toString)
        else spark.conf.unset("spark.sql.files.maxPartitionBytes")
        n.toString
      case "NUM_NODES" =>
        val n = parseBytes(k, v)
        // 1 = single-node execution: plan every exchange to one partition
        if (n == 1) spark.conf.set("spark.sql.shuffle.partitions", "1")
        else spark.conf.unset("spark.sql.shuffle.partitions")
        n.toString
      case "ABORT_ON_ERROR" =>
        val b = parseBool(k, v)
        // 0 = keep going past bad files (the scanners' continue-on-error
        // path); 1 = fail the query
        spark.conf.set("spark.sql.files.ignoreCorruptFiles",
          (b == "0").toString)
        b
      case "MEM_LIMIT" =>
        // recorded: per-query memory budgets are executor/JVM sizing in
        // Spark (spark.executor.memory + UnifiedMemoryManager), fixed at
        // session start — no per-query analog to enforce
        parseBytes(k, v).toString
      case "APPX_COUNT_DISTINCT" | "SYNC_DDL" | "ALLOW_UNSUPPORTED_FORMATS" |
          "ABORT_ON_DEFAULT_LIMIT_EXCEEDED" | "DISABLE_CACHED_READS" |
          "DISABLE_OUTERMOST_TOPN" | "HBASE_CACHE_BLOCKS" =>
        parseBool(k, v)
      case "EXPLAIN_LEVEL" | "MAX_ERRORS" | "MAX_IO_BUFFERS" |
          "NUM_SCANNER_THREADS" | "DEFAULT_ORDER_BY_LIMIT" |
          "HBASE_CACHING" | "QUERY_TIMEOUT_S" | "V_CPU_CORES" |
          "RESERVATION_REQUEST_TIMEOUT" | "RM_INITIAL_MEM" =>
        parseBytes(k, v).toString
      case _ => v // DEBUG_ACTION, REQUEST_POOL: free-form strings
    }
    sessionState(spark).put(k, stored)
  }
}
