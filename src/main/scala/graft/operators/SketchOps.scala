package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch set-operations over corpus slices ([[graft.functions.KmvAgg]]):
  * the capability layer above the reference's NDV parity — two KMV
  * sketches estimate UNION, INTERSECTION and Jaccard between slices
  * (snapshot overlap, cross-source duplication rates) from k longs per
  * slice and one scan per slice.
  *
  * Everything is deterministic (value = first 13 md5 hex chars of the
  * text, as a 52-bit integer) so BOTH the sketch contents and every
  * derived estimate are DuckDB-hash-checked exactly — a property no
  * RNG-seeded sketch can offer (the reference's own NDV is checkable
  * only because its hash is fixed too).
  */
object SketchOps {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  /** 52-bit content hash both engines can compute: Spark
    * conv(hex, 16, 10); DuckDB CAST('0x' || hex AS BIGINT).
    */
  def hash52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  private val oHash52 = "CAST('0x' || SUBSTR(MD5(text), 1, 13) AS BIGINT)"

  private val Two52 = 4503599627370496.0 // 2^52

  /** NDV estimate from an ascending KMV sketch array: exact size below
    * k, else (k-1)/u_k. Every op deterministic (division by 2^52 is an
    * exact exponent shift; the final division is one correctly-rounded
    * IEEE op).
    */
  private def kmvEst(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(sk, k).cast("double") / lit(Two52)))

  private val NdvK = 16

  /** Per-language KMV NDV of distinct texts next to the exact count —
    * k = 16 so the ESTIMATION path is exercised at sf0.01+ (about 100
    * distinct texts per language) while sf0.001 (10 per language)
    * exercises the exact-below-k path. The sketch itself is also
    * emitted (comma-joined) so the oracle pins CONTENT, not just the
    * estimate.
    */
  val kmvNdv: Q = Q("agg_kmv_ndv",
    (s, d) => t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("text")).as("exact_ndv"),
        call_function("kmv_sketch", hash52(col("text")), lit(NdvK))
          .as("__sk"))
      .select(col("lang"), col("exact_ndv"),
        kmvEst(col("__sk"), NdvK).as("kmv_est"),
        array_join(transform(col("__sk"), x => x.cast("string")), ",")
          .as("sketch"))
      .orderBy(col("lang")),
    Some(s"""WITH h AS (
      |  SELECT lang, text, $oHash52 AS hv FROM documents),
      |sk AS (
      |  SELECT lang, hv, DENSE_RANK() OVER (PARTITION BY lang
      |    ORDER BY hv) rk
      |  FROM (SELECT DISTINCT lang, hv FROM h)),
      |agg AS (
      |  SELECT lang,
      |    CAST(COUNT(CASE WHEN rk <= $NdvK THEN 1 END) AS INT) AS sz,
      |    MAX(CASE WHEN rk = $NdvK THEN hv END) AS uk,
      |    ARRAY_TO_STRING(LIST_SORT(LIST(hv) FILTER (WHERE rk <= $NdvK)), ',')
      |      AS sketch
      |  FROM sk GROUP BY lang),
      |ex AS (
      |  SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_ndv
      |  FROM documents GROUP BY lang)
      |SELECT ex.lang, exact_ndv,
      |  CASE WHEN sz < $NdvK THEN CAST(sz AS DOUBLE)
      |       ELSE ${NdvK - 1}.0 / (CAST(uk AS DOUBLE) / ${Two52}) END
      |    AS kmv_est,
      |  sketch
      |FROM ex JOIN agg ON ex.lang = agg.lang
      |ORDER BY ex.lang""".stripMargin))

  private val SetK = 64

  /** Theta-style set operations between two overlapping corpus slices
    * (A = even doc_ids, B = doc_id % 3 = 0 — organically overlapping
    * at every SF): theta = min over full sketches of u_k (1 when a
    * side is below k), candidates = sketch values < theta,
    * union ~ |A u B candidates| / theta, intersection ~ |in both| /
    * theta, plus the Jaccard ratio. Arrays, filters and counts only —
    * no driver math; the two sketches meet in a 1-row broadcast
    * cross join exactly like the engine's scalar-subquery pattern.
    */
  val setOverlap: Q = Q("set_overlap_kmv",
    (s, d) => {
      val doc = t(s, d, "documents")
      // ONE corpus scan builds BOTH sketches: the aggregate skips the
      // NULLs a non-member row contributes (PlanBudgetSpec pins the
      // single-scan shape — at 100 TB this is the whole point)
      val h = hash52(col("text"))
      val both = doc.agg(
        call_function("kmv_sketch",
          when(col("doc_id") % 2 === 0, h), lit(SetK)).as("ska"),
        call_function("kmv_sketch",
          when(col("doc_id") % 3 === 0, h), lit(SetK)).as("skb"))
      def thetaL(sk: Column): Column =
        when(size(sk) < SetK, lit((1L << 52)))
          .otherwise(element_at(sk, SetK))
      val joined = both
        .withColumn("__th",
          least(thetaL(col("ska")), thetaL(col("skb"))))
        .withColumn("__fa", filter(col("ska"), x => x < col("__th")))
        .withColumn("__fb", filter(col("skb"), x => x < col("__th")))
      joined.select(
        lit(SetK).as("k"),
        (col("__th").cast("double") / lit(Two52)).as("theta"),
        (size(array_union(col("__fa"), col("__fb"))).cast("double") /
          (col("__th").cast("double") / lit(Two52))).as("union_est"),
        (size(array_intersect(col("__fa"), col("__fb"))).cast("double") /
          (col("__th").cast("double") / lit(Two52))).as("inter_est"),
        (size(array_intersect(col("__fa"), col("__fb"))).cast("double") /
          size(array_union(col("__fa"), col("__fb"))).cast("double"))
          .as("jaccard_est"))
    },
    Some(s"""WITH ha AS (
      |  SELECT DISTINCT $oHash52 AS hv FROM documents WHERE doc_id % 2 = 0),
      |hb AS (
      |  SELECT DISTINCT $oHash52 AS hv FROM documents WHERE doc_id % 3 = 0),
      |ska AS (SELECT hv FROM ha ORDER BY hv LIMIT $SetK),
      |skb AS (SELECT hv FROM hb ORDER BY hv LIMIT $SetK),
      |th AS (
      |  SELECT LEAST(
      |    CASE WHEN (SELECT COUNT(*) FROM ska) < $SetK
      |         THEN ${1L << 52} ELSE (SELECT MAX(hv) FROM ska) END,
      |    CASE WHEN (SELECT COUNT(*) FROM skb) < $SetK
      |         THEN ${1L << 52} ELSE (SELECT MAX(hv) FROM skb) END) AS t),
      |fa AS (SELECT hv FROM ska, th WHERE hv < t),
      |fb AS (SELECT hv FROM skb, th WHERE hv < t),
      |cnt AS (
      |  SELECT
      |    (SELECT COUNT(*) FROM (SELECT hv FROM fa UNION SELECT hv FROM fb))
      |      AS u,
      |    (SELECT COUNT(*) FROM (SELECT hv FROM fa INTERSECT SELECT hv FROM fb))
      |      AS i)
      |SELECT CAST($SetK AS INT) AS k,
      |  CAST(t AS DOUBLE) / ${Two52} AS theta,
      |  CAST(u AS DOUBLE) / (CAST(t AS DOUBLE) / ${Two52}) AS union_est,
      |  CAST(i AS DOUBLE) / (CAST(t AS DOUBLE) / ${Two52}) AS inter_est,
      |  CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jaccard_est
      |FROM th, cnt""".stripMargin))

  private val RollK = 32

  /** Rolling distinct counts via KMV MERGEABILITY — the capability
    * that makes sketches worth storing: build ONE small sketch per
    * (day) partition, then answer every 7-day sliding window by
    * MERGING stored sketches (union of bottom-k sets = sort, distinct,
    * take k) instead of re-scanning raw data. At 100 TB the daily
    * aggregate is the only corpus-sized job; the rolling layer is a
    * window over one row per day. Everything integer (the md5-52
    * recipe), so sketch contents AND the rolling estimates
    * hash-check.
    */
  val kmvRolling: Q = Q("agg_kmv_rolling",
    (s, d) => {
      Engine.configure(s)
      val ev = Engine.table(s, d, "events")
        .select(expr("(ts - ts % 1000) div 86400000000000").as("day"),
          hash52(col("user_id").cast("string")).as("hv"))
      val daily = ev.groupBy(col("day"))
        .agg(call_function("kmv_sketch", col("hv"), lit(RollK))
          .as("sk"),
          countDistinct(col("hv")).as("exact_day"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day")).rangeBetween(-6, 0)
      val rolled = daily
        .withColumn("__merged",
          slice(array_sort(array_distinct(flatten(
            collect_list(col("sk")).over(w)))), 1, RollK))
        .withColumn("__ndays", count(lit(1)).over(w))
      rolled.select(col("day"), col("__ndays").as("n_days"),
          col("exact_day"),
          kmvEst(col("__merged"), RollK).as("rolling_est"),
          array_join(transform(col("__merged"), x => x.cast("string")),
            ",").as("merged_sketch"))
        .orderBy(col("day"))
    },
    Some {
      val oH = "CAST('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT)"
      s"""WITH ev AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day, $oH AS hv
      |  FROM events),
      |dist AS (SELECT DISTINCT day, hv FROM ev),
      |sk AS (
      |  SELECT day, hv, ROW_NUMBER() OVER (PARTITION BY day
      |    ORDER BY hv) rk
      |  FROM dist),
      |daily AS (
      |  SELECT day,
      |    LIST_SORT(LIST(hv) FILTER (WHERE rk <= $RollK)) AS sk,
      |    CAST(COUNT(*) AS BIGINT) AS exact_day
      |  FROM sk GROUP BY day),
      |rolled AS (
      |  SELECT a.day,
      |    CAST(COUNT(DISTINCT b.day) AS BIGINT) AS n_days,
      |    ANY_VALUE(a.exact_day) AS exact_day,
      |    LIST_SORT(LIST(DISTINCT u.h))[1 : $RollK] AS merged
      |  FROM daily a
      |  JOIN daily b ON b.day BETWEEN a.day - 6 AND a.day,
      |    UNNEST(b.sk) u(h)
      |  GROUP BY a.day)
      |SELECT day, n_days, exact_day,
      |  CASE WHEN LEN(merged) < $RollK THEN CAST(LEN(merged) AS DOUBLE)
      |       ELSE ${RollK - 1}.0 /
      |         (CAST(merged[$RollK] AS DOUBLE) / ${Two52}) END
      |    AS rolling_est,
      |  ARRAY_TO_STRING(merged, ',') AS merged_sketch
      |FROM rolled
      |ORDER BY day""".stripMargin
    })

  /** Pairwise source-overlap matrix — the corpus diagnostic behind
    * "which feeds are re-crawling each other": ONE scan builds a KMV
    * sketch per source, then every source PAIR gets theta-style
    * union / intersection / Jaccard estimates from a self-join of the
    * 5-row sketch table. The all-pairs stage costs nothing (sources²
    * rows of k longs); the corpus is touched once — at 100 TB this is
    * the only affordable way to get an overlap matrix at all.
    */
  val sourceOverlap: Q = Q("source_overlap_matrix",
    (s, d) => {
      val doc = t(s, d, "documents")
      val sk = doc.groupBy(col("source"))
        .agg(call_function("kmv_sketch", hash52(col("text")), lit(SetK))
          .as("sk"))
      val a = sk.select(col("source").as("src_a"), col("sk").as("ska"))
      val b = sk.select(col("source").as("src_b"), col("sk").as("skb"))
      def thetaL(c: Column): Column =
        when(size(c) < SetK, lit(1L << 52)).otherwise(element_at(c, SetK))
      a.join(b, col("src_a") < col("src_b"))
        .withColumn("__th", least(thetaL(col("ska")), thetaL(col("skb"))))
        .withColumn("__fa", filter(col("ska"), x => x < col("__th")))
        .withColumn("__fb", filter(col("skb"), x => x < col("__th")))
        .select(col("src_a"), col("src_b"),
          size(array_intersect(col("__fa"), col("__fb"))).as("inter_k"),
          size(array_union(col("__fa"), col("__fb"))).as("union_k"),
          (size(array_intersect(col("__fa"), col("__fb"))).cast("double") /
            size(array_union(col("__fa"), col("__fb"))).cast("double"))
            .as("jaccard_est"))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some(s"""WITH h AS (
      |  SELECT DISTINCT source, $oHash52 AS hv FROM documents),
      |rk AS (
      |  SELECT source, hv, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY hv) rn, COUNT(*) OVER (PARTITION BY source) AS cnt
      |  FROM h),
      |sk AS (SELECT source, hv, rn, cnt FROM rk WHERE rn <= $SetK),
      |uk AS (
      |  SELECT source,
      |    CASE WHEN MAX(cnt) < $SetK THEN CAST(${1L << 52} AS BIGINT)
      |         ELSE MAX(CASE WHEN rn = $SetK THEN hv END) END AS th
      |  FROM sk GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    LEAST(a.th, b.th) AS th
      |  FROM uk a JOIN uk b ON a.source < b.source),
      |cnts AS (
      |  SELECT p.src_a, p.src_b,
      |    (SELECT COUNT(*) FROM sk x JOIN sk y ON x.hv = y.hv
      |     WHERE x.source = p.src_a AND y.source = p.src_b
      |       AND x.hv < p.th) AS inter_k,
      |    (SELECT COUNT(DISTINCT z.hv) FROM sk z
      |     WHERE z.source IN (p.src_a, p.src_b) AND z.hv < p.th)
      |      AS union_k
      |  FROM pairs p)
      |SELECT src_a, src_b, CAST(inter_k AS INT) AS inter_k,
      |  CAST(union_k AS INT) AS union_k,
      |  CAST(inter_k AS DOUBLE) / CAST(union_k AS DOUBLE) AS jaccard_est
      |FROM cnts ORDER BY src_a, src_b""".stripMargin))

  val defs: Seq[Q] = Seq(kmvNdv, setOverlap, kmvRolling, sourceOverlap)
}
