package graft

import org.scalatest.funsuite.AnyFunSuite

/** The TImpalaQueryOptions surface (ImpalaService.thrift:32-165,
  * QueryTest/set.test): option parsing/validation plus the Spark-session
  * side effects each applied option maps to.
  */
class QueryOptionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def sql(q: String) = Engine.sql(spark, TestSpark.sf, q)

  test("DISABLE_CODEGEN toggles whole-stage codegen") {
    def plan(): String = {
      val df = sql("select count(*) from nation")
      df.collect() // finalize the AQE plan before reading it
      df.queryExecution.executedPlan.toString
    }
    // whole-stage codegen renders as "*(n)" operator prefixes
    sql("set disable_codegen=1")
    try {
      assert(spark.conf.get("spark.sql.codegen.wholeStage") == "false")
      assert(!plan().contains("*("), plan())
    } finally sql("set disable_codegen=0")
    assert(spark.conf.get("spark.sql.codegen.wholeStage") == "true")
    assert(plan().contains("*("), plan())
  }

  test("COMPRESSION_CODEC drives the parquet writer codec") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_qopt_codec"
    def writtenWith(codec: String): String = {
      sql(s"set compression_codec=$codec")
      sql("select n_nationkey, n_name from nation")
        .write.mode("overwrite").parquet(dir)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getName
      f
    }
    try {
      assert(writtenWith("GZIP").contains(".gz."))
      assert(writtenWith("SNAPPY").contains(".snappy."))
      assert(writtenWith("NONE").matches(".*part-.*(?<!gz|py)\\.parquet"))
    } finally sql("set compression_codec=NONE")
  }

  test("BATCH_SIZE and MAX_SCAN_RANGE_LENGTH land in the reader confs") {
    sql("set batch_size=512; set max_scan_range_length='16m'")
    try {
      assert(spark.conf.get(
        "spark.sql.parquet.columnarReaderBatchSize") == "512")
      assert(spark.conf.get(
        "spark.sql.files.maxPartitionBytes") == (16L * 1024 * 1024).toString)
    } finally sql("set batch_size=0; set max_scan_range_length=0")
  }

  test("NUM_NODES=1 plans single-partition exchanges") {
    sql("set num_nodes=1")
    try {
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "1")
    } finally sql("set num_nodes=0")
    assert(spark.conf.get("spark.sql.shuffle.partitions") != "1")
  }

  test("size suffixes parse like the reference (1.5g, 2m, plain int)") {
    sql("set mem_limit='1.5g'")
    assert(QueryOptions.get(spark, "mem_limit") == "1610612736")
    sql("set mem_limit='2m'")
    assert(QueryOptions.get(spark, "mem_limit") == (2L * 1024 * 1024).toString)
    sql("set mem_limit=12345")
    assert(QueryOptions.get(spark, "mem_limit") == "12345")
    sql("set mem_limit=0")
  }

  test("validation errors carry the reference's messages") {
    val e1 = intercept[IllegalArgumentException](sql("set parquet_file_size='2g'"))
    assert(e1.getMessage.contains(
      "The PARQUET_FILE_SIZE query option must be less than 2GB."))
    val e2 = intercept[IllegalArgumentException](sql("set foo=bar"))
    assert(e2.getMessage.contains("Ignoring invalid configuration option: foo"))
    val e3 = intercept[IllegalArgumentException](
      sql("set parquet_compression_codec=bar"))
    assert(e3.getMessage.contains("Invalid compression codec: bar"))
  }

  test("APPX_COUNT_DISTINCT rewrites count(distinct) to ndv_hll") {
    sql("set appx_count_distinct=1")
    try {
      val est = sql("select count(distinct l_partkey) c from lineitem")
        .collect()(0).getLong(0)
      val direct = sql("select ndv_hll(l_partkey) c from lineitem")
        .collect()(0).getLong(0)
      assert(est == direct)
      // multi-argument count(distinct a, b) is untouched (the reference
      // rewrites only the single-slot form)
      val multi = sql(
        "select count(distinct l_partkey, l_suppkey) c from lineitem")
        .collect()(0).getLong(0)
      val exactMulti = sql("set appx_count_distinct=0; " +
        "select count(distinct l_partkey, l_suppkey) c from lineitem")
        .collect()(0).getLong(0)
      assert(multi == exactMulti)
    } finally sql("set appx_count_distinct=0")
    val exact = sql("select count(distinct l_partkey) c from lineitem")
      .collect()(0).getLong(0)
    assert(exact >= 190) // sf0.001: 200 distinct parts, estimate differs
  }

  test("EXPLAIN_LEVEL drives the EXPLAIN verbosity (explain-level parity)") {
    def explainOut(): String =
      sql("explain select count(*) from nation")
        .collect().map(_.getString(0)).mkString("\n")
    try {
      sql("set explain_level=1")
      val l1 = explainOut()
      assert(l1.contains("== Physical Plan =="), l1)
      assert(!l1.contains("== Optimized Logical Plan =="), l1)
      sql("set explain_level=2")
      val l2 = explainOut()
      assert(l2.contains("== Optimized Logical Plan =="), l2)
      sql("set explain_level=3")
      val l3 = explainOut()
      assert(l3.contains("(1) Scan parquet") || l3.contains("Exchange"), l3)
      // an explicit mode always wins over the option
      sql("set explain_level=1")
      val ext = sql("explain extended select count(*) from nation")
        .collect().map(_.getString(0)).mkString("\n")
      assert(ext.contains("== Optimized Logical Plan =="), ext)
    } finally sql("set explain_level=1")
  }

  test("DEFAULT_ORDER_BY_LIMIT caps a bare top-level ORDER BY") {
    try {
      sql("set default_order_by_limit=5")
      val capped = sql("select n_nationkey from nation order by n_nationkey")
      assert(capped.collect().length == 5)
      // an explicit LIMIT always wins
      val explicit = sql(
        "select n_nationkey from nation order by n_nationkey limit 9")
      assert(explicit.collect().length == 9)
      // subquery ORDER BY is untouched (the option is top-level only)
      val sub = sql("select count(*) c from " +
        "(select n_nationkey from nation order by n_nationkey) t")
      assert(sub.collect()(0).getLong(0) == 25)
    } finally sql("set default_order_by_limit=-1")
    assert(sql("select n_nationkey from nation order by n_nationkey")
      .collect().length == 25)
  }

  test("leading SET statements compose with a trailing query") {
    val r = sql("set explain_level=2;\nset sync_ddl=1;\nselect 1 as x")
      .collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1))
    assert(QueryOptions.get(spark, "explain_level") == "2")
    assert(QueryOptions.get(spark, "sync_ddl") == "1")
    sql("set explain_level=1; set sync_ddl=0")
    // dotted keys stay Spark confs
    sql("set spark.sql.cbo.enabled=false")
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false")
  }
}
