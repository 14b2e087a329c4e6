package graft

import org.scalatest.funsuite.AnyFunSuite

/** Conformance with the reference's QueryTest/show-create-table.test:
  * SHOW CREATE TABLE emits DDL that faithfully carries column types,
  * column/table comments, partitioning and table properties — and, the
  * actual contract the reference test exists for, RE-EXECUTING the
  * emitted DDL reproduces an equivalent table. The reference pins its
  * own exact DDL text (Impala's renderer); Spark's renderer differs
  * textually (USING parquet vs STORED AS), so each case here asserts
  * the roundtrip plus the presence of every carried fact. Format
  * mapping per the engine's storage story: TEXTFILE/SEQUENCEFILE/
  * RCFILE shapes are exercised as the engine's native formats (csv /
  * parquet), with sources/Formats covering the scanners themselves.
  */
class ShowCreateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** create -> show create -> drop -> re-execute -> compare. */
  private def roundtrip(name: String, ddl: String,
      mustContain: Seq[String] = Nil): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(ddl)
    try {
      val shown = spark.sql(s"SHOW CREATE TABLE $name")
        .collect()(0).getString(0)
      mustContain.foreach(frag =>
        assert(shown.contains(frag), s"missing '$frag' in:\n$shown"))
      val before = spark.table(name).schema
      val beforePart = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
        .partitionColumnNames
      spark.sql(s"DROP TABLE $name")
      spark.sql(shown)
      assert(spark.table(name).schema == before)
      val afterPart = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
        .partitionColumnNames
      assert(afterPart == beforePart)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("show-create-table.test: simple table") {
    roundtrip("sct1", "CREATE TABLE sct1 (id INT) USING parquet",
      Seq("CREATE TABLE", "id INT"))
  }

  test("show-create-table.test: all types with a column comment") {
    roundtrip("sct2",
      """CREATE TABLE sct2 (
        |  year INT, month INT, id INT COMMENT 'Add a comment',
        |  bool_col BOOLEAN, tinyint_col TINYINT, smallint_col SMALLINT,
        |  int_col INT, bigint_col BIGINT, float_col FLOAT,
        |  double_col DOUBLE, date_string_col STRING, string_col STRING,
        |  timestamp_col TIMESTAMP)
        |USING parquet""".stripMargin,
      Seq("Add a comment", "TINYINT", "TIMESTAMP"))
  }

  test("show-create-table.test: partitioned table carries PARTITIONED BY") {
    roundtrip("sct3",
      """CREATE TABLE sct3 (id INT COMMENT 'Add a comment', v STRING,
        |  x INT, y INT, a BOOLEAN)
        |USING parquet PARTITIONED BY (x, y, a)""".stripMargin,
      Seq("PARTITIONED BY", "Add a comment"))
  }

  test("show-create-table.test: table comment carries through") {
    roundtrip("sct4",
      """CREATE TABLE sct4 (year INT, id INT COMMENT 'Add a comment')
        |USING parquet COMMENT 'This is a test'""".stripMargin,
      Seq("This is a test", "Add a comment"))
  }

  test("show-create-table.test: delimited text options carry through") {
    // ROW FORMAT DELIMITED FIELDS TERMINATED BY '$' ESCAPED BY '#' (the
    // reference's dollar/hash table shape) -> csv options. A backslash
    // escape char does not survive Spark's option re-quoting — the
    // hash form exercises the same carry-through.
    roundtrip("sct5",
      """CREATE TABLE sct5 (year INT, month INT, id INT)
        |USING csv OPTIONS (sep '$', escape '#')""".stripMargin,
      Seq("csv", "sep"))
  }

  test("show-create-table.test: tblproperties carry through unordered") {
    roundtrip("sct7",
      """CREATE TABLE sct7 (year INT, id INT)
        |USING parquet
        |TBLPROPERTIES ('key3'='val3', 'key2'='val2', 'key1'='val1')"""
        .stripMargin,
      Seq("key1", "val1", "key2", "val2", "key3", "val3"))
    // and they are readable back as properties, like SHOW TBLPROPERTIES
    spark.sql("CREATE TABLE sct7b (id INT) USING parquet " +
      "TBLPROPERTIES ('key1'='val1')")
    try {
      val props = spark.sql("SHOW TBLPROPERTIES sct7b").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(props.get("key1").contains("val1"))
    } finally spark.sql("DROP TABLE sct7b")
  }

  test("show-create-table.test: external location is preserved") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sct_loc"
    spark.sql("DROP TABLE IF EXISTS sct_loc")
    spark.sql(s"CREATE TABLE sct_loc (id INT) USING parquet LOCATION '$dir'")
    try {
      val shown = spark.sql("SHOW CREATE TABLE sct_loc")
        .collect()(0).getString(0)
      assert(shown.contains("LOCATION"), shown)
      assert(shown.contains("graft_sct_loc"), shown)
    } finally spark.sql("DROP TABLE IF EXISTS sct_loc")
  }
}
