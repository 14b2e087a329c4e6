package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hilbert-curve data layout — the higher-locality sibling of
  * [[ZOrder]]: same one-range-shuffle cost, same min/max pruning
  * mechanism, but consecutive keys are always adjacent cells, so file
  * envelopes are compact tiles without the Morton curve's diagonal
  * jumps (HilbertSpec pins both the adjacency property and the
  * pruning win on real parquet footers). Key computation is the
  * codegen'd [[graft.functions.HilbertKernel]] expression.
  */
object HilbertCurve {

  /** Hilbert index of (x, y) on the 2^bits grid; inputs must sit in
    * [0, 2^bits) — out-of-range fails loudly in the kernel.
    */
  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    call_function("hilbert_key", x.cast("long"), y.cast("long"), lit(bits))

  /** Range-partition + sort by the Hilbert key: one shuffle, the same
    * cost class as a single-column sorted write.
    */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
      bits: Int, numFiles: Int): DataFrame =
    df.withColumn("__h", hilbertKey(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")

  /** Driver entry + FULL oracle: the Hilbert key of every order over
    * (o_custkey, epoch-days(o_orderdate)) at 21 bits — the exact
    * mirror of `layout_zorder`, so the two layout keys are directly
    * comparable. DuckDB re-derives the key by running the same
    * quadrant-rotate state machine as a recursive CTE (one level per
    * bit, all integer ops).
    */
  val hilbertEntry: Q = Q("layout_hilbert",
    (s, d) => {
      Engine.configure(s)
      Engine.table(s, d, "orders")
        .select(col("o_orderkey"),
          hilbertKey(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1970-01-01")), 21).as("hkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH RECURSIVE base AS (
      |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
      |    CAST(DATEDIFF('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
      |      AS y
      |  FROM orders),
      |h AS (
      |  SELECT o_orderkey, x, y, CAST(0 AS BIGINT) AS d,
      |    CAST(1048576 AS BIGINT) AS s
      |  FROM base
      |  UNION ALL
      |  SELECT o_orderkey,
      |    CASE WHEN (y & s) > 0 THEN x
      |         WHEN (x & s) > 0 THEN s - 1 - y ELSE y END AS x,
      |    CASE WHEN (y & s) > 0 THEN y
      |         WHEN (x & s) > 0 THEN s - 1 - x ELSE x END AS y,
      |    d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
      |                    CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END) AS d,
      |    s // 2 AS s
      |  FROM h WHERE s > 0)
      |SELECT o_orderkey, d AS hkey FROM h WHERE s = 0
      |ORDER BY o_orderkey""".stripMargin))

  val defs: Seq[Q] = Seq(hilbertEntry)
}
