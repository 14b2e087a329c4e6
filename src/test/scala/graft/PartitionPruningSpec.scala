package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruning parity with the reference's
  * QueryTest/partition-col-types.test EXPLAIN expectations
  * (`partitions=X/Y` from HdfsPartitionPruner.java over
  * HdfsScanNode): every partition-key type — tinyint through string,
  * float/double, boolean, decimal — must prune by value predicate at
  * PLAN time, reading only the matching partition directories. The
  * VALUE conformance for the same tables lives in
  * golden/reference-partition-cols.test; this spec pins the reference's
  * exact pruned-partition counts against Spark's file-source partition
  * selection (the 100 TB property: a scan of a 10k-partition table with
  * a key predicate must touch X directories, not all of them).
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clearStale(names: String*): Unit = names.foreach { t =>
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
  }

  private def setup(): Unit = synchronized {
    if (!spark.catalog.tableExists("prune_all_insert")) {
      Engine.configure(spark)
      clearStale("prune_all_insert", "prune_bool", "prune_dec")
      spark.sql(
        """create table prune_all_insert (
          |  id int, tinyint_col tinyint, smallint_col smallint,
          |  int_col int, bigint_col bigint, float_col float,
          |  double_col double, string_col string)
          |using parquet
          |partitioned by (tinyint_col, smallint_col, int_col, bigint_col,
          |  float_col, double_col, string_col)""".stripMargin)
      spark.sql(
        """insert overwrite table prune_all_insert
          |partition (tinyint_col, smallint_col, int_col, bigint_col,
          |  float_col, double_col, string_col)
          |select id, cast(id as tinyint), cast(id as smallint), id,
          |  cast(id * 10 as bigint), cast(0.0 as float), 1.1d,
          |  cast(id as string)
          |from (select explode(sequence(0, 9)) id)""".stripMargin)
      spark.sql(
        """insert overwrite table prune_all_insert
          |partition (tinyint_col=11, smallint_col=11, int_col=11,
          |  bigint_col=110, float_col=2, double_col=3.1, string_col='11')
          |select 11""".stripMargin)
      spark.sql(
        """create table prune_bool (id int, bool_col boolean)
          |using parquet partitioned by (bool_col)""".stripMargin)
      spark.sql("insert into prune_bool partition (bool_col=false) select 1")
      spark.sql("insert into prune_bool partition (bool_col=true) select 2")
      spark.sql(
        """create table prune_dec (id int, dec decimal(5,4),
          |  decimal_col decimal(5,4))
          |using parquet partitioned by (decimal_col)""".stripMargin)
      spark.sql(
        "insert into prune_dec partition (decimal_col=4.34) values (1, 3.14)")
      spark.sql(
        """insert into prune_dec partition (decimal_col)
          |values (2, 6.28, 8.68), (0, 1.23, 8.68), (3, 4.56, 1.0)""".stripMargin)
    }
  }

  /** Partitions selected at plan time for the scan in `df` — the
    * Spark-side value of the reference's EXPLAIN `partitions=X/...`.
    */
  private def partitionsRead(df: DataFrame): Int = {
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
    scans.map(_.selectedPartitions.partitionCount).sum
  }

  private def prunes(sql: String, want: Int): Unit = {
    setup()
    assert(partitionsRead(spark.sql(sql)) === want, sql)
  }

  test("partition-col-types.test: typed partition keys all prune (partitions=X/11 parity)") {
    prunes("select * from prune_all_insert", 11)
    // partitions=3/11
    prunes(
      """select * from prune_all_insert
        |where tinyint_col < 7 and smallint_col < 6 and int_col < 5
        |  and bigint_col < 40 and string_col in ('1', '2', '3')""".stripMargin, 3)
    prunes("select * from prune_all_insert where tinyint_col < 7", 7)
    prunes("select * from prune_all_insert where smallint_col < 6", 6)
    prunes("select * from prune_all_insert where int_col < 5", 5)
    prunes("select * from prune_all_insert where bigint_col < 40", 4)
    prunes("select * from prune_all_insert where string_col in ('1', '2', '3')", 3)
    prunes("select * from prune_all_insert where double_col = 1.1", 10)
    prunes("select * from prune_all_insert where float_col = 2", 1)
  }

  test("boolean partition key prunes (partitions=1/2 parity)") {
    prunes("select * from prune_bool where bool_col = false", 1)
  }

  test("IMPALA-1026: decimal partition keys prune, any literal scale") {
    prunes("select * from prune_dec where decimal_col = 4.34", 1)
    prunes("select * from prune_dec where decimal_col = 04.340", 1)
    prunes("select * from prune_dec where decimal_col = 4.35", 0)
    prunes("select * from prune_dec where decimal_col = 8.68", 1)
  }

  /** PlannerTest/hdfs.test:43-300 — the reference's year/month
    * (2009-2010 x 1-12 = 24 partitions) compound-predicate pruning
    * battery, each `partitions=X/24` EXPLAIN claim pinned against
    * Spark's plan-time partition selection: NOT over conjuncts and
    * disjuncts, null-check interactions, <=> spellings, ranges,
    * BETWEEN, IN, always-true/false conjuncts, and contradictions.
    */
  private def setupYm(): Unit = synchronized {
    if (!spark.catalog.tableExists("prune_ym")) {
      Engine.configure(spark)
      clearStale("prune_ym")
      spark.sql(
        """create table prune_ym (id int)
          |using parquet partitioned by (year int, month int)""".stripMargin)
      spark.sql(
        """insert into prune_ym partition (year, month)
          |select y * 100 + m, y, m
          |from (select explode(sequence(2009, 2010)) y)
          |cross join (select explode(sequence(1, 12)) m)""".stripMargin)
    }
  }

  private def prunesYm(where: String, want: Int): Unit = {
    setupYm()
    assert(partitionsRead(
      spark.sql(s"select * from prune_ym where $where")) === want, where)
  }

  test("hdfs.test:43-140 — basic and NOT-compound predicates (partitions=X/24 parity)") {
    setupYm()
    assert(partitionsRead(spark.sql("select * from prune_ym")) === 24)
    prunesYm("year = 2009", 12)
    prunesYm("2009 = year", 12)
    prunesYm("2009 <=> year", 12)
    prunesYm("!(month > 2)", 4)
    prunesYm("!(!(month = 1))", 2)
    prunesYm("!(!(month <=> 1))", 2)
    prunesYm("year = 2009 and !(month < 6)", 7)
    prunesYm("!(year < 2009) and !(month < 6)", 14)
  }

  test("hdfs.test:150-212 — NOT over conjuncts/disjuncts and null checks") {
    prunesYm("!(year = 2009 and month > 6)", 18)
    prunesYm("!(year <=> 2009 and month > 6)", 18)
    prunesYm("!(year <=> 2009) or !(month > 6)", 18)
    prunesYm("!(month = 6 or month = 8)", 20)
    prunesYm("!(month <=> 6 or month <=> 8)", 20)
    prunesYm("not (year = 2009 or month is null)", 12)
    prunesYm("not (year = 2009 or month <=> null)", 12)
    prunesYm("not (not (month is null))", 0)
    prunesYm("not (not (month <=> null))", 0)
    prunesYm("not (not (month is null or year = 2009))", 12)
  }

  test("hdfs.test:213-300 — ranges, IN, BETWEEN, always-true/false, contradictions") {
    prunesYm("month = 1", 2)
    prunesYm("year = 2009 and month = 1", 1)
    prunesYm("year = 2009 and month > 6", 6)
    prunesYm("year = 2009 and month < 6", 5)
    prunesYm("year = 2009 and month in (1, 3, 5, 7)", 4)
    prunesYm("year <=> 2009 and month in (1, 3, 5, 7)", 4)
    prunesYm("year = 2009 and month in (1, 3, 5, 7) and month is not null", 4)
    prunesYm("year = 2009 and month in (1, 3, 5, 7) and month is null", 0)
    prunesYm("year = 2009 and (month in (1, 3, 5) or month = 7)", 4)
    prunesYm("year <= 2009 and month < 6", 5)
    prunesYm("month < 9 and month > 6", 4)
    prunesYm("year < 2010 and year < 2009 and month > 6", 0)
    prunesYm("year < 2010 and (month > 6 or month = 1 or month in (3, 4))", 9)
    prunesYm("year < 2010 and (month > 6 or month <=> 1 or month in (3, 4))", 9)
    prunesYm("year = 2009 and month between 6 and 8", 3)
    prunesYm("year <=> 2009 and month between 6 and 8", 3)
    prunesYm("year between 2009 and 2009 and month between 6 and 8", 3)
    prunesYm("year = 2009 and (month between 6 and 7 or month between 7 and 8)", 3)
  }

  test("semi-join value transfer prunes partitions through an IN-subquery") {
    // the 100 TB payoff of plans/SemiJoinValueTransfer: a literal (or
    // range) on the subquery's key statically prunes the PARTITIONED
    // probe side — before runtime filters even start
    setupYm()
    spark.sql("create or replace temp view prune_dim as select explode(sequence(2009, 2012)) y")
    assert(partitionsRead(spark.sql(
      """select * from prune_ym
        |where year in (select y from prune_dim where y = 2009)""".stripMargin)) === 12)
    assert(partitionsRead(spark.sql(
      """select * from prune_ym
        |where month in (select y from prune_dim where y < 2011 and y > 2008)""".stripMargin)) === 0)
  }
}
