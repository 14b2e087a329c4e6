package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine.Materialize

/** EXACT order statistics at corpus scale — iterative histogram
  * refinement (distributed selection): each round ONE
  * map-side-combinable aggregation histograms the surviving value
  * range(s) into up to 2^12 equal-width buckets, the driver (≤ 4096
  * longs of state per active range) walks the counts to the bucket
  * containing each k-th value, and the ranges narrow 4096x.
  * ceil(bits(range)/12) passes total — 6 scans for a full 64-bit
  * domain, 1-2 for real columns — versus a global sort's shuffle of
  * the entire corpus. (Width history: 8-bit rounds until r14; these
  * tiny jobs are latency-bound, so 12-bit rounds cut wide-domain
  * pass counts ~1.5x for free — the collect stays a few thousand
  * rows.)
  *
  * Multi-k (r11 verdict #2): ALL requested order statistics share every
  * pass. One bounds scan serves every k; each refinement round issues a
  * single aggregation whose CASE-dispatched group column histograms all
  * surviving ranges at once (cursor ranges are by construction either
  * identical — they share a group — or disjoint, since each is a
  * sub-bucket of the previous round's partition). p50/p90/p99 of a
  * 2^13-wide domain is 3 scans total, not 12.
  *
  * The reference's appx_median (and this engine's reservoir twin) trade
  * exactness for one pass; this is the exact complement when the answer
  * must be right (SLA thresholds, billing cutoffs).
  */
object ExactQuantile {

  /** All requested k-th smallest (1-based) values of an integer-valued
    * column in shared passes. Returns (k -> value, rounds). Requires
    * 1 <= k <= count for every k. Delegates to the grouped walk with a
    * single constant tag — ONE copy of the selection core to maintain.
    */
  def kthSmallestMulti(df: DataFrame, c: Column,
      ks: Seq[Long]): (Map[Long, Long], Int) = {
    val src = df.select(lit(0).as("__t"), c.cast("long").as("__v"))
    val bounds = groupedBounds(src)
    require(bounds.contains(0), "empty input to kthSmallestMulti")
    val (m, rounds) = groupedSelect(src, bounds, Map(0 -> ks))
    (m.map { case ((_, k), v) => k -> v }, rounds)
  }

  /** The k-th smallest (1-based) value of an integer-valued column.
    * Returns (value, rounds). Requires 1 <= k <= count.
    */
  def kthSmallest(df: DataFrame, c: Column, k: Long): (Long, Int) = {
    val (m, rounds) = kthSmallestMulti(df, c, Seq(k))
    (m(k), rounds)
  }

  /** GROUPED multi-k: order statistics for SEVERAL tagged populations
    * in the same relation, every pass shared across tags AND ks —
    * the funnel-lags shape (a handful of giant groups, each needing
    * its own percentiles), where per-tag [[kthSmallestMulti]] calls
    * would pay tags × (bounds + rounds) driver-synchronized jobs and
    * this pays 1 + max-rounds. A cursor's dispatch key is
    * (tag, range): ranges of different tags may overlap in value, so
    * the tag rides in the group expression; within one tag ranges
    * stay identical-or-disjoint exactly as in the untagged walk.
    *
    * `ks`: per tag, the requested 1-based ranks (each within that
    * tag's count). Returns ((tag, k) -> value, rounds). Tags absent
    * from `ks` are ignored; a tag in `ks` must have rows.
    *
    * Group dispatch is an EXPRESSION (a when-chain one branch per
    * active (tag, range)), so this path is for a BOUNDED number of
    * giant groups — a few thousand at most; for high-cardinality
    * grouping use the per-group sort recipe (`exact_quantiles_grouped`),
    * whose one shuffle handles millions of small groups.
    */
  def kthSmallestMultiGrouped(df: DataFrame, tag: Column, c: Column,
      ks: Map[Int, Seq[Long]]): (Map[(Int, Long), Long], Int) = {
    if (ks.isEmpty) return (Map.empty, 0)
    val src = df.select(tag.cast("int").as("__t"),
      c.cast("long").as("__v"))
    groupedSelect(src, groupedBounds(src), ks)
  }

  /** One job: per-tag (min, max, count) of the normalized relation.
    * Tags whose values are ALL null (count 0, NULL min/max) are
    * omitted — they behave exactly like absent tags downstream
    * instead of NPE-ing a primitive getter on a NULL min.
    */
  private def groupedBounds(src: DataFrame)
      : Map[Int, (Long, Long, Long)] =
    src.groupBy(col("__t"))
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        count(col("__v")).as("n"))
      .collect()
      .filter(!_.isNullAt(1))
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  private case class GCursor(t: Int, k: Long, kRem: Long,
      lo: Long, hi: Long)

  private def groupedSelect(src: DataFrame,
      bounds: Map[Int, (Long, Long, Long)],
      ks: Map[Int, Seq[Long]]): (Map[(Int, Long), Long], Int) = {
    var curs = ks.toSeq.flatMap { case (t, tks) =>
      val (lo0, hi0, n) = bounds.getOrElse(t,
        throw new IllegalArgumentException(
          s"kthSmallestMultiGrouped: tag $t has no rows"))
      require(hi0 - lo0 >= 0L,
        s"tag $t value range exceeds 2^63; rescale the column")
      tks.distinct.map { k =>
        require(k >= 1 && k <= n, s"tag $t: k=$k out of range 1..$n")
        GCursor(t, k, k, lo0, hi0)
      }
    }
    var rounds = 0
    while (curs.exists(cu => cu.lo < cu.hi)) {
      rounds += 1
      val groups = curs.filter(cu => cu.lo < cu.hi)
        .map(cu => (cu.t, cu.lo, cu.hi)).distinct
      val shifts = groups.map { case (_, lo, hi) =>
        math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(hi - lo) - 12)
      }
      // POWER-OF-TWO bucket width + shiftright: Spark's `/` on longs
      // is fractional Divide — double rounding at 2^60 magnitudes
      // merges adjacent buckets and silently corrupts the selection;
      // a shift is exact at every magnitude. 2049-4096 buckets per
      // round (12 bits: a wide domain needs ceil(bits/12) passes; the
      // driver walk and the collect stay trivially small here).
      // ONE aggregation pass for every surviving (tag, range): group
      // id by tag + range membership (within a tag, ranges are
      // identical-or-disjoint), bucket by the group's own shift.
      val gCol = groups.zipWithIndex.foldLeft(lit(-1)) {
        case (acc, ((t, lo, hi), i)) =>
          when(col("__t") === t && col("__v").between(lo, hi), lit(i))
            .otherwise(acc)
      }
      val bCol = groups.zip(shifts).zipWithIndex.foldLeft(lit(-1)) {
        case (acc, (((t, lo, hi), sh), i)) =>
          when(col("__t") === t && col("__v").between(lo, hi),
            shiftright(col("__v") - lo, sh).cast("int"))
            .otherwise(acc)
      }
      val cnts = src.select(gCol.as("__g"), bCol.as("__b"))
        .filter(col("__g") >= 0)
        .groupBy("__g", "__b").agg(count(lit(1)).as("__n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (g, rs) =>
          g -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
        }
      curs = curs.map { cu =>
        if (cu.lo >= cu.hi) cu
        else {
          val g = groups.indexOf((cu.t, cu.lo, cu.hi))
          val shift = shifts(g)
          val width = 1L << shift
          val byB = cnts.getOrElse(g, Map.empty[Int, Long])
          var b = 0
          var cum = 0L
          while (cum + byB.getOrElse(b, 0L) < cu.kRem) {
            cum += byB.getOrElse(b, 0L); b += 1
          }
          // newLo = lo + b*width <= lo + (hi-lo) — never overflows;
          // the upper edge lo + width - 1 CAN wrap when hi is within
          // one width of Long.MaxValue, so tighten via subtraction
          // only when it provably lands below hi (r11 ADVICE).
          val nLo = cu.lo + b * width
          val nHi = if (cu.hi - nLo >= width) nLo + width - 1 else cu.hi
          GCursor(cu.t, cu.k, cu.kRem - cum, nLo, nHi)
        }
      }
    }
    (curs.map(cu => (cu.t, cu.k) -> cu.lo).toMap, rounds)
  }

  /** Per-tag counts + exact percentiles over one tagged relation,
    * sharing the bounds job and every refinement pass across tags
    * ([[kthSmallestMultiGrouped]]). Returns tag -> (n, p -> value);
    * tags with no rows are simply absent.
    */
  def percentilesGrouped(df: DataFrame, tag: Column, c: Column,
      ps: Seq[Int]): Map[Int, (Long, Map[Int, Long])] = {
    val src = df.select(tag.cast("int").as("__t"),
      c.cast("long").as("__v"))
    val bounds = groupedBounds(src) // ONE job serves ns and ranges
    val pk = bounds.collect { case (t, (_, _, n)) if n > 0 =>
      t -> ps.map(p => p -> math.max(1L, (p.toLong * n + 99L) / 100L)).toMap
    }
    if (pk.isEmpty) return Map.empty
    val (byK, _) = groupedSelect(src, bounds,
      pk.map { case (t, m) => t -> m.values.toSeq })
    pk.map { case (t, m) =>
      t -> (bounds(t)._3, m.map { case (p, k) => p -> byK((t, k)) })
    }
  }

  /** Exact percentiles as lower order statistics (the
    * ceil(p/100 * n)-th smallest), all sharing every scan.
    */
  def percentiles(df: DataFrame, c: Column, ps: Seq[Int]): Map[Int, Long] =
    percentilesWithCount(df, c, ps)._2

  /** [[percentiles]] plus the row count from the SAME counting job —
    * for callers that need n anyway (one driver-synchronized job per
    * call saved; empty input returns (0, empty) instead of failing).
    */
  def percentilesWithCount(df: DataFrame, c: Column,
      ps: Seq[Int]): (Long, Map[Int, Long]) = {
    val n = df.agg(count(c)).head().getLong(0)
    if (n == 0L) return (0L, Map.empty)
    val pk = ps.map(p => p -> math.max(1L, (p.toLong * n + 99L) / 100L)).toMap
    val (byK, _) = kthSmallestMulti(df, c, pk.values.toSeq)
    (n, pk.map { case (p, k) => p -> byK(k) })
  }

  def percentile(df: DataFrame, c: Column, p: Int): Long =
    percentiles(df, c, Seq(p))(p)

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
      // the selection runs several driver-synchronized passes (count,
      // bounds, refinement rounds), each its OWN action — materialize
      // the narrow value column once, fanned to full parallelism, so
      // every pass reads cached longs instead of re-scanning the
      // single-row-group parquet serially (measured: 0.7 s per pass
      // at sf0.1; guide §1.2/§2.5). Keying on the VALUE violates
      // fanOut's high-cardinality contract on paper (~50 distinct
      // l_quantity values over 32 partitions), but the r15 A/B
      // (carry l_orderkey through and key on it, select c after)
      // measured 2.27 s vs 1.56 s warm — the extra scan column plus
      // the twice-as-wide exchange cost more than the mild imbalance
      // (max/median ≈ 2, under the guide §2.5 5-10x threshold), and
      // the downstream passes are placement-independent aggregations.
      val src = Engine.fanOut(li.select(cents.as("c")), col("c"))
        .materialized
      val got = ExactQuantile.percentiles(src, col("c"), Seq(50, 90, 99))
      got.toSeq.map { case (p, v) => (p, v / 100.0) }
        .toDF("p", "value").orderBy(col("p"))
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

  /** Driver entry + FULL oracle: exact per-GROUP percentiles — the
    * complementary recipe to the global histogram-refinement path:
    * when groups are many, ONE hash shuffle + per-group sort computes
    * every group's order statistics in parallel (rank k = max(1,
    * ceil(p·n/100)), the same definition as the global operator); a
    * single pathological giant group is what the global multi-pass
    * selection is for. Ties cost nothing: the VALUE at sorted position
    * k is well-defined whatever order row_number gives equal keys.
    */
  val quantilesGrouped: Q = Q("exact_quantiles_grouped",
    (s, d) => {
      Engine.configure(s)
      import org.apache.spark.sql.expressions.Window
      val cents = (col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
      val v = Engine.table(s, d, "lineitem")
        .select(col("l_returnflag").as("g"), cents.as("c"))
      val w = Window.partitionBy(col("g")).orderBy(col("c"))
      v.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
        .withColumn("p", explode(array(lit(50), lit(90), lit(99))))
        .filter(col("rn") ===
          greatest(lit(1L), expr("(p * n + 99) div 100")))
        .select(col("g"), col("p"),
          (col("c").cast("double") / 100.0).as("value"))
        .orderBy(col("g"), col("p"))
    },
    Some("""WITH v AS (
      |  SELECT l_returnflag AS g,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) c,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
      |        AS BIGINT)) rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) n
      |  FROM lineitem),
      |e AS (SELECT g, c, rn, n, p
      |      FROM v, UNNEST([50, 90, 99]) u(p))
      |SELECT g, CAST(p AS INT) AS p, CAST(c AS DOUBLE) / 100.0 AS value
      |FROM e WHERE rn = GREATEST(1, (p * n + 99) // 100)
      |ORDER BY g, p""".stripMargin))

  val defs: Seq[Q] = Seq(quantiles, quantilesGrouped)
}
