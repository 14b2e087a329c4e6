package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Dialect-function semantics (the analog of the reference's
  * be/src/exprs/expr-test.cc value grids, trimmed to the registered
  * surface).
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sql: String): Row =
    Engine.sql(spark, TestSpark.sf, s"SELECT $sql").head()

  test("fnv_hash matches FNV-1a 64 reference value") {
    assert(one("fnv_hash('hello')").getLong(0) === -6615550055289275125L)
  }

  test("fnv_hash hashes native fixed-width bytes for numerics") {
    // reference hashes raw slot bytes: fnv(int 1) != fnv('1')
    val r = one("fnv_hash(CAST(1 AS INT)), fnv_hash('1'), " +
      "fnv_hash(CAST(1 AS BIGINT)), fnv_hash(CAST(1.0 AS DOUBLE)), " +
      "fnv_hash(true)")
    assert(r.getLong(0) === graft.functions.FnvHash64.hashFixed(1L, 4))
    assert(r.getLong(0) !== r.getLong(1))
    assert(r.getLong(2) === graft.functions.FnvHash64.hashFixed(1L, 8))
    assert(r.getLong(3) === graft.functions.FnvHash64.hashFixed(
      java.lang.Double.doubleToLongBits(1.0), 8))
    assert(r.getLong(4) === graft.functions.FnvHash64.hashFixed(1L, 1))
  }

  test("trunc: Impala unit-code grid (udf-builtins.cc:104-145)") {
    // 2016-05-08 (a Sunday) 10:30:25; Jan 1 2016 = Friday, May 1 = Sunday
    val ts = "TIMESTAMP_NTZ '2016-05-08 10:30:25'"
    val grid = Seq(
      "SYYYY" -> "2016-01-01 00:00:00", "YYYY" -> "2016-01-01 00:00:00",
      "YEAR" -> "2016-01-01 00:00:00", "Y" -> "2016-01-01 00:00:00",
      "Q" -> "2016-04-01 00:00:00",
      "MONTH" -> "2016-05-01 00:00:00", "MM" -> "2016-05-01 00:00:00",
      "RM" -> "2016-05-01 00:00:00",
      "WW" -> "2016-05-06 00:00:00", // most recent Friday (Jan 1 anchor)
      "W" -> "2016-05-08 00:00:00",  // most recent Sunday (May 1 anchor)
      "DDD" -> "2016-05-08 00:00:00", "DD" -> "2016-05-08 00:00:00",
      "J" -> "2016-05-08 00:00:00",
      "DAY" -> "2016-05-02 00:00:00", // previous Monday
      "DY" -> "2016-05-02 00:00:00", "D" -> "2016-05-02 00:00:00",
      "HH" -> "2016-05-08 10:00:00", "HH12" -> "2016-05-08 10:00:00",
      "HH24" -> "2016-05-08 10:00:00",
      "MI" -> "2016-05-08 10:30:00")
    for ((unit, want) <- grid) {
      val got = one(s"CAST(trunc($ts, '$unit') AS STRING)").getString(0)
      assert(got === want, s"unit $unit")
    }
  }

  test("dot_vec is bit-identical to the sequential HOF fold") {
    val r = Engine.sql(spark, TestSpark.sf,
      """SELECT dot_vec(embedding, embedding) AS native,
        |  aggregate(zip_with(embedding, embedding,
        |    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |    CAST(0.0 AS DOUBLE), (acc, p) -> acc + p) AS folded
        |FROM embeddings""".stripMargin).collect()
    assert(r.nonEmpty)
    assert(r.forall(row => row.getDouble(0) == row.getDouble(1)))
    // mixed float/double element types and null propagation
    val m = one("dot_vec(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
      "array(CAST(2.0 AS DOUBLE), CAST(0.5 AS DOUBLE))), " +
      "dot_vec(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1 AS FLOAT)))")
    assert(m.getDouble(0) === 4.0)
    assert(m.isNullAt(1))
  }

  test("dot_vec null ELEMENT yields NULL like the zip_with fold") {
    val r = one(
      "dot_vec(array(CAST(1 AS DOUBLE), CAST(NULL AS DOUBLE)), " +
        "array(CAST(2 AS DOUBLE), CAST(3 AS DOUBLE))), " +
      "aggregate(zip_with(array(CAST(1 AS DOUBLE), CAST(NULL AS DOUBLE)), " +
        "array(CAST(2 AS DOUBLE), CAST(3 AS DOUBLE)), (x, y) -> x * y), " +
        "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)")
    assert(r.isNullAt(0))
    assert(r.isNullAt(1)) // the documented-equivalent fold agrees
  }

  test("fnv_hash and round dispatch survive column (non-literal) args") {
    // decimal/timestamp columns take the cast-to-string fallback instead
    // of failing type-check — dispatch happens post-analysis, so column
    // references behave exactly like literals of the same type
    val r = Engine.sql(spark, TestSpark.sf,
      """SELECT fnv_hash(CAST(o_totalprice AS DECIMAL(14,2))) AS h1,
        |       fnv_hash(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS STRING)) AS h2,
        |       round(o_totalprice + 0.5d) AS r1
        |FROM orders ORDER BY o_orderkey LIMIT 1""".stripMargin).head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.get(2).isInstanceOf[Long]) // dialect round(double) -> BIGINT
  }

  test("sample() is type-generic: strings and timestamps sampled verbatim") {
    val s = one("sample(concat('nm_', CAST(1 AS STRING)))").getString(0)
    assert(s === "nm_1")
    val r = Engine.sql(spark, TestSpark.sf,
      "SELECT sample(n_name) FROM nation").head().getString(0)
    val names = r.split(", ").toSet
    assert(names.size === 25)
    assert(names.contains("NATION_0"))
    val ts = one("sample(TIMESTAMP'2023-01-05 10:11:12')").getString(0)
    assert(ts === "2023-01-05 10:11:12")
    val tsf = one("sample(TIMESTAMP'2023-01-05 10:11:12.25')").getString(0)
    assert(tsf === "2023-01-05 10:11:12.250000")
  }

  test("nanoseconds_add/_sub truncate the delta toward zero to micros") {
    val ts = "TIMESTAMP '2016-05-08 10:30:25'"
    val r = one(s"CAST(nanoseconds_add($ts, 1500) AS STRING), " +
      s"CAST(nanoseconds_add($ts, 999) AS STRING), " +
      s"CAST(nanoseconds_sub($ts, 2000000000) AS STRING)")
    assert(r.getString(0) === "2016-05-08 10:30:25.000001")
    assert(r.getString(1) === "2016-05-08 10:30:25")
    assert(r.getString(2) === "2016-05-08 10:30:23")
  }

  test("extract: Impala field grid incl. millisecond and epoch") {
    val ts = "TIMESTAMP_NTZ '2016-05-08 10:30:25.123'"
    val r = one(s"extract($ts, 'year'), extract($ts, 'month'), " +
      s"extract($ts, 'day'), extract($ts, 'hour'), extract($ts, 'minute'), " +
      s"extract($ts, 'second'), extract($ts, 'millisecond'), " +
      s"extract($ts, 'epoch'), date_part('minute', $ts)")
    assert(r.getInt(0) === 2016)
    assert(r.getInt(1) === 5)
    assert(r.getInt(2) === 8)
    assert(r.getInt(3) === 10)
    assert(r.getInt(4) === 30)
    assert(r.getInt(5) === 25)
    assert(r.getInt(6) === 123)
    assert(r.getInt(7) === 1462703425)
    assert(r.getInt(8) === 30) // date_part takes the field first
  }

  test("fnv_hash null propagation") {
    assert(one("fnv_hash(CAST(NULL AS STRING))").isNullAt(0))
  }

  test("strleft / strright") {
    val r = one("strleft('abcdef', 3), strright('abcdef', 2), " +
      "strleft('ab', 99), strright('ab', 0)")
    assert(r.getString(0) === "abc")
    assert(r.getString(1) === "ef")
    assert(r.getString(2) === "ab")
    assert(r.getString(3) === "")
  }

  test("zeroifnull / nullifzero") {
    val r = one("zeroifnull(CAST(NULL AS INT)), zeroifnull(7), " +
      "nullifzero(0), nullifzero(5)")
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) === 7)
    assert(r.isNullAt(2))
    assert(r.getInt(3) === 5)
  }

  test("boolean predicates") {
    val r = one("isfalse(NULL), istrue(1=1), isnottrue(NULL), " +
      "nonnullvalue(NULL), nullvalue(NULL)")
    assert(r.getBoolean(0) === false)
    assert(r.getBoolean(1) === true)
    assert(r.getBoolean(2) === true)
    assert(r.getBoolean(3) === false)
    assert(r.getBoolean(4) === true)
  }

  test("quotient: bigint division, null on zero divisor") {
    val r = one("quotient(11, 3), quotient(-11, 3), quotient(10.9, 3), " +
      "quotient(1, 0)")
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === -3L)
    assert(r.getLong(2) === 3L) // casts to bigint first, like the reference
    assert(r.isNullAt(3))
  }

  test("bit functions operate within the input's width") {
    // Spark literals type as INT (width 32; Impala's literals take the
    // smallest fit — divergence pinned in SURVEY 7.3), so rotation counts
    // reduce mod 32 and zero-counts complement against 32
    val r = one("rotateleft(1, 65), rotateright(2, 1), getbit(5, 0), " +
      "getbit(5, 1), setbit(8, 0), setbit(9, 0, 0), countset(255), " +
      "countset(255, 0)")
    assert(r.getInt(0) === 2) // 65 mod 32 = 1
    assert(r.getInt(1) === 1)
    assert(r.getByte(2) === 1.toByte)
    assert(r.getByte(3) === 0.toByte)
    assert(r.getLong(4) === 9L)
    assert(r.getLong(5) === 8L)
    assert(r.getInt(6) === 8)
    assert(r.getInt(7) === 24) // 32-bit input: 32 - 8
    // native-width semantics: tinyint all-ones has 8 set bits, not 64
    val t = one("countset(cast(-1 as tinyint)), countset(cast(-1 as smallint)), " +
      "countset(cast(-1 as bigint)), rotateleft(cast(1 as tinyint), 9), " +
      "rotateright(cast(2 as tinyint), 1)")
    assert(t.getInt(0) === 8)
    assert(t.getInt(1) === 16)
    assert(t.getInt(2) === 64)
    assert(t.getByte(3) === 2.toByte) // 9 mod 8 = 1, stays tinyint
    assert(t.getByte(4) === 1.toByte)
  }

  test("is_inf / is_nan (non-ANSI division semantics give NULL for 1/0)") {
    val r = one("is_inf(cast('inf' as double)), is_nan(cast('nan' as double)), " +
      "is_inf(1.5), is_nan(1.5)")
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === true)
    assert(r.getBoolean(2) === false)
    assert(r.getBoolean(3) === false)
  }

  test("date names") {
    val r = one("dayname(TIMESTAMP '2026-08-12 00:00:00'), " +
      "monthname(TIMESTAMP '2026-08-12 00:00:00')")
    assert(r.getString(0) === "Wednesday")
    assert(r.getString(1) === "August")
  }

  test("int_months_between truncates like the reference") {
    val r = one("int_months_between(TIMESTAMP '1998-03-15 00:00:00', " +
      "TIMESTAMP '1998-01-31 00:00:00')")
    assert(r.getInt(0) === 1)
  }

  test("ndv approximates distinct count") {
    val r = Engine.sql(spark, TestSpark.sf,
      "SELECT ndv(l_suppkey) n, count(distinct l_suppkey) x FROM lineitem").head()
    val (n, x) = (r.getLong(0), r.getLong(1))
    assert(math.abs(n - x).toDouble / x < 0.15, s"ndv=$n exact=$x")
  }

  test("group_concat with separator and distinct") {
    val r = Engine.sql(spark, TestSpark.sf,
      "SELECT group_concat(DISTINCT l_returnflag, '|') FROM lineitem").head()
    assert(r.getString(0).split('|').sorted.mkString(",") === "A,N,R")
  }

  test("simhash: identical token sets agree, disjoint sets differ") {
    val r = Engine.sql(spark, TestSpark.sf,
      """SELECT simhash(array(xxhash64('a'), xxhash64('b'), xxhash64('c'))) s1,
        |       simhash(array(xxhash64('a'), xxhash64('b'), xxhash64('c'))) s2,
        |       simhash(array(xxhash64('x'), xxhash64('y'), xxhash64('zq'))) s3
        |""".stripMargin).head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) !== r.getLong(2))
  }
}
