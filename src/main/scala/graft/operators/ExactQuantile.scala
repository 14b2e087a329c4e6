package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT order statistics at corpus scale — iterative histogram
  * refinement (distributed selection): each round ONE
  * map-side-combinable aggregation histograms the surviving value
  * range into 256 equal-width buckets, the driver (256 longs of
  * state) walks the counts to the bucket containing the k-th value,
  * and the range narrows 256x. ceil(log256(range)) + 1 passes total —
  * 5 scans for a full 64-bit domain, 2-3 for real columns — versus a
  * global sort's shuffle of the entire corpus. The reference's
  * appx_median (and this engine's reservoir twin) trade exactness for
  * one pass; this is the exact complement when the answer must be
  * right (SLA thresholds, billing cutoffs).
  */
object ExactQuantile {

  /** The k-th smallest (1-based) value of an integer-valued column.
    * Returns (value, rounds). Requires 1 <= k <= count.
    */
  def kthSmallest(df: DataFrame, c: Column, k: Long): (Long, Int) = {
    val bounds = df.agg(min(c).cast("long"), max(c).cast("long"),
      count(c)).head()
    require(!bounds.isNullAt(0), "empty input to kthSmallest")
    require(k >= 1 && k <= bounds.getLong(2),
      s"k=$k out of range 1..${bounds.getLong(2)}")
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    // full-int64-span inputs would overflow the width arithmetic
    require(hi - lo >= 0L, "value range exceeds 2^63; rescale the column")
    var kRem = k
    var rounds = 0
    while (lo < hi) {
      rounds += 1
      // POWER-OF-TWO bucket width + shiftright: Spark's `/` on longs is
      // fractional Divide — double rounding at 2^60 magnitudes merges
      // adjacent buckets and silently corrupts the selection; a shift
      // is exact at every magnitude. 256-512 buckets per round.
      val shift = math.max(0,
        64 - java.lang.Long.numberOfLeadingZeros(hi - lo) - 8)
      val width = 1L << shift
      val cnts = df.filter(c.cast("long").between(lo, hi))
        .groupBy(shiftright(c.cast("long") - lo, shift).cast("int")
          .as("__b"))
        .agg(count(lit(1)).as("__n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var b = 0
      var cum = 0L
      while (cum + cnts.getOrElse(b, 0L) < kRem) {
        cum += cnts.getOrElse(b, 0L); b += 1
      }
      kRem -= cum
      lo = lo + b * width
      hi = math.min(hi, lo + width - 1)
    }
    (lo, rounds)
  }

  /** Exact percentile as the lower order statistic: the
    * ceil(p/100 * n)-th smallest.
    */
  def percentile(df: DataFrame, c: Column, p: Int): Long = {
    val n = df.agg(count(c)).head().getLong(0)
    val k = math.max(1L, (p.toLong * n + 99L) / 100L)
    kthSmallest(df, c, k)._1
  }

  /** Driver entry + full oracle: exact p50/p90/p99 of lineitem
    * quantity in cents (2dp decimal scaled to integer domain —
    * selection needs an integer-valued column; any fixed-point
    * decimal qualifies). DuckDB recomputes each as the literal
    * ROW_NUMBER order statistic over the global sort this operator
    * exists to avoid.
    */
  val quantiles: Q = Q("exact_quantiles",
    (s, d) => {
      Engine.configure(s)
      val li = Engine.table(s, d, "lineitem")
      val cents = (col("l_quantity").cast("decimal(12,2)") * 100)
        .cast("long")
      import s.implicits._
      Seq(50, 90, 99).map { p =>
        (p, ExactQuantile.percentile(li, cents, p) / 100.0)
      }.toDF("p", "value").orderBy(col("p"))
    },
    Some("""WITH v AS (
      |  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) c,
      |    ROW_NUMBER() OVER (ORDER BY l_quantity) rn,
      |    COUNT(*) OVER () n
      |  FROM lineitem)
      |SELECT p, CAST(c AS DOUBLE) / 100.0 AS value FROM (
      |  SELECT 50 AS p, c FROM v WHERE rn = GREATEST(1, (50 * n + 99) // 100)
      |  UNION ALL
      |  SELECT 90, c FROM v WHERE rn = GREATEST(1, (90 * n + 99) // 100)
      |  UNION ALL
      |  SELECT 99, c FROM v WHERE rn = GREATEST(1, (99 * n + 99) // 100))
      |ORDER BY p""".stripMargin))

  val defs: Seq[Q] = Seq(quantiles)
}
