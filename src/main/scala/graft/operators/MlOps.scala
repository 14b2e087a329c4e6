package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Engine.Materialize

/** Distributed training-data ML primitives: full-corpus k-means
  * (Lloyd's), SemDeDup semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540), and a hashed-feature linear quality probe
  * trained by normal equations (feature hashing per Weinberger et al.
  * 2009; the fasttext-shaped linear classifier of Joulin et al. 2016).
  *
  * Everything here is deterministic by construction so the driver's
  * DuckDB gate can hash-check it end to end:
  *
  *  - Centroid distances are the [[graft.functions.PqKernels]]
  *    `cell_dists` comparison keys (`|c|^2 - 2 x.c`, index-order
  *    sequential folds) — bit-identical to a DuckDB LIST_REDUCE mirror.
  *  - Per-cluster component sums use EXACT POWER-OF-TWO SCALING:
  *    `v * 2^53` multiplies a float-derived double's exponent only
  *    (no mantissa rounding for any |v| >= 2^-29), so the scaled value
  *    is an integer-valued double that both engines cast to
  *    DECIMAL(38,0) exactly; decimal sums are association-free, which
  *    makes the distributed update independent of partitioning. (The
  *    NOTES rule-4 float->decimal tie hazard does not apply: there is
  *    no rounding left to tie.)
  *  - The quality probe's sufficient statistics (Gram matrix and
  *    moment vector over hashed token counts) are integers, and the
  *    3-feature scoring entry solves its normal equations by CRAMER'S
  *    RULE in exact integer arithmetic (determinant-scaled margins:
  *    sign(w.x) = sign(det-weighted integer score * sign(det A)),
  *    DECIMAL(38,0) in Spark / HUGEINT in DuckDB).
  *
  * Scale shapes (100 TB): k-means is one assignment scan plus one
  * (k x dim)-row aggregate per iteration — model state on the driver
  * is k*dim doubles, broadcast back as a literal; SemDeDup's pair
  * stage is partitioned by cell so the quadratic is bounded by cluster
  * size (the published recipe: pick k so N/k pairs fit — clustering
  * IS the blocking); the probe is a single Gram-accumulation pass
  * (map-side combinable, F^2/2 output rows) and an O(F^3) driver
  * solve, F = 33.
  */
object MlOps {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  /** 2^53: scales any |v| >= 2^-29 float-derived double to an
    * integer-valued double without rounding (see object doc).
    */
  private val Scale = 9007199254740992.0

  private val TwinOff = 10000000L

  // ---- shared DuckDB snippets (index-order folds, see cell_dists) ----

  private def oFold(expr: String): String =
    s"LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), $expr), (a, b) -> a + b)"

  private def oDot(x: String, y: String): String =
    oFold(s"LIST_TRANSFORM(LIST_ZIP($x, $y), " +
      "pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))")

  /** Centroid CTE (the k smallest ids' vectors, the deterministic init
    * both engines share) + per-vector nearest-cell assignment, the
    * exact mirror of [[assignCells]]: key = |c|^2 - 2 x.c as two
    * sequential folds, first-min-index tie-break.
    */
  private def oAssign(src: String, k: Int): String =
    s"""c AS MATERIALIZED (
       |  SELECT vec_id AS cell, embedding AS ce,
       |    ${oDot("embedding", "embedding")} AS nrm
       |  FROM embeddings WHERE vec_id < $k),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY c.nrm - 2.0 * ${oDot("e.embedding", "c.ce")}, c.cell) rn
       |    FROM $src e, c) r WHERE rn = 1)""".stripMargin

  // ---- distributed k-means -------------------------------------------

  /** Nearest-centroid cell per row via the codegen'd cell_dists kernel
    * (broadcast centroid literal); ties resolve to the smallest cell
    * index (first index of the array minimum).
    *
    * The centroid matrix is ONE `Literal.create` node, not composed
    * `array(lit, ...)` expressions — at k = 10000 the composed form is
    * a 640k-node expression tree and Catalyst analysis alone pegs the
    * driver for tens of minutes (the k-wide-literal lesson from the
    * IVF kernels, one level up).
    */
  def assignCells(df: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val lits = typedlit[Seq[Seq[Double]]](
      cents.toIndexedSeq.map(_.toIndexedSeq))
    df.withColumn("__kd", call_function("cell_dists", col(vecCol), lits))
      .withColumn("cell",
        (array_position(col("__kd"), array_min(col("__kd"))) - 1).cast("int"))
      .drop("__kd")
  }

  /** EXACT nearest-centroid assignment via two-level triangle-pruned
    * search ([[graft.functions.CoarseKernels]], r11 verdict #7) —
    * bit-identical cells to [[assignCells]] (MlOpsSpec pins equality)
    * at ~O(n * (sqrt(k) + visited) * dim) instead of O(n * k * dim).
    * The scale path once k grows with the corpus (SemDeDup's
    * prescribed composition); at small k the flat scan's simpler
    * kernel wins, so callers switch on k.
    */
  def assignCellsCoarse(df: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val lits = typedlit[Seq[Seq[Double]]](
      cents.toIndexedSeq.map(_.toIndexedSeq))
    val m0 = math.max(1, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    // bounded driver sample of REAL rows tunes the super count — the
    // centroids alone are a misleading pruning proxy (see
    // CoarseKernels.chooseM); 512 vectors, the IVF-fit precedent for
    // a scale-invariant driver collect. The choice only affects
    // speed; the assignment is exact for any index.
    // spread across the corpus by seeded-random order (TakeOrdered:
    // one scan, no full shuffle). A bare limit() short-circuits on the
    // first partitions (head rows = the centroids' own replicas in
    // replica-blocked layouts), and CONTENT-hash order degenerates
    // under exact duplicates: all copies tie at the minimum hash and
    // tie-resolution hands back 512 clones of one centroid row —
    // both measured to bias the tuner to a uselessly small m. The
    // seeded rand is repeatable for a fixed partitioning, and the
    // choice only affects speed, never assignment values.
    val sample = df.select(col(vecCol))
      .orderBy(rand(42).asc)
      .limit(512).collect().map { r =>
      r.get(0) match {
        // Spark hands array columns back as mutable.ArraySeq — the
        // bare `Seq` (immutable in 2.13) silently missed it and the
        // tuner fell back to centroid queries
        case s: scala.collection.Seq[_] => s.map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
          case x => x.toString.toDouble
        }.toArray
        case _ => Array.empty[Double]
      }
    }.filter(_.nonEmpty)
    val m = graft.functions.CoarseKernels.chooseM(cents, m0, sample)
    df.withColumn("cell",
      call_function("cell_assign_coarse", col(vecCol), lits, lit(m)))
  }

  /** Assignment dispatch: flat scan at small k, coarse-pruned exact
    * search once the centroid matrix is the dominant per-row cost.
    */
  def assignCellsAuto(df: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame =
    if (cents.length >= 256) assignCellsCoarse(df, vecCol, cents)
    else assignCells(df, vecCol, cents)

  /** The exact-integer component sums of one Lloyd's update: per
    * (cell, dim) the DECIMAL(38,0) sum of `v * 2^53` plus the member
    * count. This is the distributed half of [[kmeansFit]]'s iteration,
    * exposed so the gate can hash-check it (csum as a decimal string —
    * scale-proof, no double cast).
    */
  def lloydUpdate(df: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    // EXACT integer sums on the LONG fast path (the r12 scaled-k
    // profile put ~110 of 124 s inside this aggregate when it summed
    // DECIMAL(38,0) — BigDecimal-backed, off the codegen fast path,
    // 8M rows per iteration at the 1000x sweep). v * 2^53 is an
    // exactly-representable integer double (power-of-two scaling
    // never rounds); split it into hi = floor(v53 / 2^31) and
    // lo = v53 - hi * 2^31 in [0, 2^31) — both exact doubles, both
    // long-safe for |v| < 2^10 (any unit-ish embedding) — and sum the
    // two LONGs (overflow-free for < 2^32 members per cell). The
    // exact decimal string 2^31 * hi + lo is reconstructed AFTER
    // aggregation, on k*dim rows, not n*dim. Bit-identical output to
    // the old DECIMAL(38,0) path (the kmeans_update oracle pins it).
    val v53 = col("__v").cast(DoubleType) * lit(Scale)
    val two31 = 2147483648.0
    val hi = floor(v53 / lit(two31))
    val assigned0 = assignCellsAuto(df, vecCol, cents)
    // At large k, MATERIALIZE the assignment through an exchange on
    // `cell` before the explode: CollapseProject substitutes the
    // single-use `cell` alias into the aggregate's grouping key, and
    // the assignment kernel then re-evaluates once per EXPLODED row —
    // dim x the work (measured 44.5 s vs 0.8 s for the scan itself at
    // k=10000, dim=64, 500k rows). The exchange pins one evaluation
    // per input row, and hashpartitioning(cell) already satisfies the
    // (cell, pos) clustering, so the aggregate adds no second shuffle.
    // At small k the kernel is cheap and the skewed low-cardinality
    // exchange would cost more than it saves.
    val assigned = if (cents.length >= 256)
      assigned0.repartition(col("cell")) else assigned0
    assigned
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .select(col("cell"), col("pos"), hi.cast(LongType).as("__h"),
        (v53 - hi * lit(two31)).cast(LongType).as("__l"))
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("__h")).as("__sh"),
        sum(col("__l")).as("__sl"))
      .select(col("cell"), col("pos").cast("int").as("pos"), col("n"),
        (col("__sh").cast(DecimalType(38, 0)) * lit(2147483648L) +
          col("__sl").cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).cast("string").as("csum"))
  }

  /** Full-corpus distributed Lloyd's: init = the k smallest ids'
    * vectors; each iteration is one assignment scan + one
    * (k x dim)-row exact-decimal aggregate collected to the driver
    * (bounded: k*dim rows regardless of corpus size), new centroid =
    * (csum / 2^53) / n. Exact decimal sums make the fit independent of
    * partitioning — MlOpsSpec pins distributed == sequential reference
    * bit-for-bit. Empty cells keep their previous centroid (k never
    * silently degrades). Differs from
    * [[SimilarityOps]]'s IVF quantizer fit, which trains on a bounded
    * driver-side SAMPLE: this one aggregates the WHOLE corpus every
    * iteration — the variant a full-corpus SemDeDup clustering needs.
    */
  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Array[Array[Double]] = {
    val init: Array[Array[Double]] = emb.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(init.nonEmpty, "empty input to kmeansFit")
    var cents = init
    val dim = cents(0).length
    for (_ <- 0 until iters) {
      val rows = lloydUpdate(emb, vecCol, cents).collect()
      val sums = Array.fill(cents.length, dim)(BigDecimal(0))
      val counts = new Array[Long](cents.length)
      rows.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        sums(c)(p) = BigDecimal(r.getString(3))
        counts(c) = r.getLong(2)
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else Array.tabulate(dim)(i =>
          (sums(c)(i).toDouble / Scale) / counts(c))
      }
    }
    cents
  }

  /** Driver entry: ONE exact Lloyd's update step from the
    * deterministic init (vec_id < 10), hash-checked — per (cell, dim)
    * the member count and the 2^53-scaled exact component sum. DuckDB
    * replays assignment (sequential-fold distance keys) and the
    * decimal sums bit-for-bit.
    */
  val kmeansUpdate: Q = Q("kmeans_update",
    (s, d) => {
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 10).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      lloydUpdate(emb, "embedding", cents)
        .orderBy(col("cell"), col("pos"))
    },
    Some(s"""WITH ${oAssign("embeddings", 10)},
      |comp AS (
      |  SELECT a.cell, CAST(u.i - 1 AS INT) pos,
      |    CAST(CAST(e.embedding[u.i] AS DOUBLE) * 9007199254740992.0
      |         AS DECIMAL(38,0)) AS q
      |  FROM assign a JOIN embeddings e USING (vec_id),
      |       UNNEST(GENERATE_SERIES(1, LEN(e.embedding))) u(i))
      |SELECT CAST(cell AS INT) cell, pos, CAST(COUNT(*) AS BIGINT) n,
      |  CAST(SUM(q) AS VARCHAR) csum
      |FROM comp GROUP BY cell, pos ORDER BY cell, pos""".stripMargin))

  // ---- SemDeDup ------------------------------------------------------

  /** SemDeDup (Abbas et al. 2023): assign every vector to its nearest
    * centroid, then WITHIN each cluster drop any vector that has a
    * smaller-id cluster-mate with cosine >= tau (keep-first — the
    * deterministic flavor of the paper's within-cluster pruning; the
    * clustering is the blocking, so the pairwise stage is quadratic
    * only in cluster size). The cosine test is sqrt-free:
    * dot >= 0 AND dot^2 >= tau^2 * (|a|^2 * |b|^2) — every factor a
    * sequential-fold double, bit-identical across engines.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], tauSq: Double,
      materialize: Boolean = false): DataFrame = {
    // the assigned relation feeds BOTH self-join sides and the final
    // anti-join: `materialize = true` localCheckpoints it so the
    // O(n*k*dim) assignment kernel runs ONCE (at k = 10000 on a 500k
    // corpus the recompute-per-branch costs more than the join
    // itself). The oracle entry keeps the plan-pure form so
    // PlanBudgetSpec can keep pinning its scan shape.
    val v0 = assignCellsAuto(emb, vecCol, cents)
      .withColumn("__nn", call_function("dot_vec", col(vecCol), col(vecCol)))
    val v = if (materialize) v0.materialized else v0
    val a = v.select(col(idCol).as("__ida"), col("cell").as("__cella"),
      col(vecCol).as("__va"), col("__nn").as("__nna"))
    val dot = call_function("dot_vec", col("__va"), col(vecCol))
    val drops = a.join(v,
        col("__cella") === col("cell") && col("__ida") < col(idCol))
      .filter(dot >= lit(0.0) &&
        dot * dot >= lit(tauSq) * (col("__nna") * col("__nn")))
      .select(col(idCol)).distinct()
    v.join(drops, Seq(idCol), "left_anti").select(col(idCol), col("cell"))
  }

  /** Driver entry + FULL semantic oracle: planted identical twins
    * (cosine exactly 1 >= tau) on a corpus whose organic pairwise
    * cosines top out near 0.51 (measured) — the twins are dropped, and
    * the output is the complete survivor set WITH its cell assignment,
    * so DuckDB hash-checks the k-means assignment of every row AND the
    * within-cluster prune, not just a twin projection.
    */
  val semanticDedupQ: Q = Q("dedup_semantic",
    (s, d) => {
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val base = emb.unionByName(emb.filter(col("vec_id") % 20 === 0)
        .withColumn("vec_id", col("vec_id") + TwinOff))
      val cents = emb.filter(col("vec_id") < 10).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      semanticDedup(base, "vec_id", "embedding", cents, tauSq = 0.64)
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH base AS MATERIALIZED (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + $TwinOff, embedding FROM embeddings
      |  WHERE vec_id % 20 = 0),
      |${oAssign("base", 10)},
      |v AS MATERIALIZED (
      |  SELECT a.vec_id, a.cell, b.embedding,
      |    ${oDot("b.embedding", "b.embedding")} AS nn
      |  FROM assign a JOIN base b USING (vec_id)),
      |drops AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE ${oDot("a.embedding", "b.embedding")} >= 0.0
      |    AND ${oDot("a.embedding", "b.embedding")} *
      |        ${oDot("a.embedding", "b.embedding")}
      |        >= 0.64 * (a.nn * b.nn))
      |SELECT vec_id, CAST(cell AS INT) cell FROM v
      |WHERE vec_id NOT IN (SELECT vec_id FROM drops)
      |ORDER BY vec_id""".stripMargin))

  // ---- hashed-feature linear quality probe ---------------------------

  /** Hashed token buckets, F = 32: the first two md5 hex chars mapped
    * through an instr table — pure string/integer ops both engines
    * evaluate identically (feature hashing, Weinberger et al. 2009).
    */
  private val F = 32
  private val Hex = "0123456789abcdef"

  private def bucketOf(w: Column): Column =
    (((instr(lit(Hex), substring(md5(w), 1, 1)) - 1) * 16 +
      (instr(lit(Hex), substring(md5(w), 2, 1)) - 1)) % F).cast("int")

  private val oBucket: String =
    s"CAST(((STRPOS('$Hex', SUBSTR(MD5(w), 1, 1)) - 1) * 16 + " +
      s"(STRPOS('$Hex', SUBSTR(MD5(w), 2, 1)) - 1)) % $F AS INT)"

  /** (doc_id, bucket, cnt) hashed bag-of-words, whitespace tokens. */
  def hashedFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"),
          x => x =!= "")).as("w"))
      .groupBy(col("doc_id"), bucketOf(col("w")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  private val oFeatures: String =
    s"""feats AS MATERIALIZED (
       |  SELECT doc_id, $oBucket bucket, CAST(COUNT(*) AS BIGINT) cnt FROM (
       |    SELECT doc_id, UNNEST(LIST_FILTER(
       |      STRING_SPLIT_REGEX(LOWER(text), '\\s+'), t -> t <> '')) w
       |    FROM documents) GROUP BY 1, 2)""".stripMargin

  /** Teacher rule standing in for human quality labels: +1 iff the doc
    * mentions 'data' (bucket 13) strictly more often than 'key'
    * (bucket 28) — both singleton buckets in the corpus vocabulary, so
    * the concept is exactly linear in the hashed features and a linear
    * probe can recover it (MlOpsSpec pins the recovered accuracy).
    */
  private val DataBkt = 13
  private val KeyBkt = 28

  private val oLabels: String =
    s"""lab AS MATERIALIZED (
       |  SELECT d.doc_id,
       |    CASE WHEN COALESCE(fd.cnt, 0) > COALESCE(fk.cnt, 0)
       |         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END y
       |  FROM documents d
       |  LEFT JOIN feats fd ON d.doc_id = fd.doc_id AND fd.bucket = $DataBkt
       |  LEFT JOIN feats fk ON d.doc_id = fk.doc_id AND fk.bucket = $KeyBkt)""".stripMargin

  /** Sufficient statistics of the linear probe in ONE distributed
    * pass: the integer Gram matrix upper triangle (i <= j over the F
    * buckets plus the bias column F) and, as j = -1 rows, the moment
    * vector X^T y. Bias rides as a constant feature (doc_id, F, 1) so
    * the pair-join covers it uniformly. Map-side combinable; output is
    * F^2/2 + F rows however large the corpus, and [[lsqFit]]'s driver
    * solve of the (F+1)x(F+1) normal equations is O(F^3) — the model
    * never touches an executor except as a broadcast literal.
    */
  def gramStats(docs: DataFrame): DataFrame = {
    // per-doc feature ARRAY (<= F+1 structs), bias appended; the pair
    // products AND the j = -1 moment rows come out of one lambda
    // explosion over it, so the whole statistic is ONE corpus scan +
    // one doc-level shuffle + one (i, j)-key aggregate
    // (PlanBudgetSpec pins documents -> 1). The relational
    // formulation (feats self-join + label join) reads the corpus 8x —
    // exactly the AQE-reuse-defeat class the budget gate exists for.
    val perDoc = docs
      .select(col("doc_id"), explode_outer(filter(
        split(lower(col("text")), "\\s+"), x => x =!= "")).as("w"))
      .groupBy(col("doc_id"), bucketOf(col("w")).as("bucket"))
      .agg(count(col("w")).as("cnt"))
      .groupBy(col("doc_id"))
      // explode_outer keeps tokenless docs as one null-bucket row that
      // collect_list's null-skipping then drops — every doc reaches the
      // bias append without a second doc-spine scan
      .agg(collect_list(when(col("bucket").isNotNull,
        struct(col("bucket"), col("cnt")))).as("__f0"))
      .select(col("doc_id"),
        concat(col("__f0"),
          array(struct(lit(F).cast("int").as("bucket"),
            lit(1L).as("cnt")))).as("f"))
    def cntOf(b: Int): Column =
      coalesce(get(filter(col("f"), x => x("bucket") === b), lit(0))("cnt"),
        lit(0L))
    val labeled = perDoc.withColumn("y",
      when(cntOf(DataBkt) > cntOf(KeyBkt), 1L).otherwise(-1L))
    // the (F^2/2 + F)-struct per-doc explosion runs as the codegen'd
    // gram_rows kernel — as a transform/filter/flatten lambda pipeline
    // it evaluated interpreted per row (NOTES hot-path rule)
    val rows = labeled.select(
      explode(call_function("gram_rows", col("f"), col("y"))).as("r"))
    rows.groupBy(col("r.i").as("i"), col("r.j").as("j"))
      .agg(sum(col("r.v")).as("v"))
  }

  /** Driver entry + full oracle for [[gramStats]]: DuckDB recomputes
    * the hashed features, teacher labels, Gram triangle, and moments.
    */
  val qualityGram: Q = Q("quality_gram",
    (s, d) => gramStats(t(s, d, "documents").select(col("doc_id"),
        col("text")))
      .orderBy(col("i"), col("j")),
    Some(s"""WITH $oFeatures,
      |$oLabels,
      |full_f AS MATERIALIZED (
      |  SELECT doc_id, bucket, cnt FROM feats
      |  UNION ALL
      |  SELECT doc_id, $F, CAST(1 AS BIGINT) FROM documents),
      |g AS (
      |  SELECT a.bucket i, b.bucket j, CAST(SUM(a.cnt * b.cnt) AS BIGINT) v
      |  FROM full_f a JOIN full_f b
      |    ON a.doc_id = b.doc_id AND a.bucket <= b.bucket
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT f.bucket i, CAST(-1 AS INT) j, CAST(SUM(f.cnt * l.y) AS BIGINT) v
      |  FROM full_f f JOIN lab l USING (doc_id) GROUP BY 1, 2)
      |SELECT CAST(i AS INT) i, CAST(j AS INT) j, v
      |FROM (SELECT * FROM g UNION ALL SELECT * FROM m) t
      |ORDER BY i, j""".stripMargin))

  /** Solve the (F+1)x(F+1) normal equations from [[gramStats]] rows on
    * the driver (Gaussian elimination, partial pivoting, tiny ridge for
    * rank-deficient hash buckets). Returns weights w(0..F-1) + bias
    * w(F).
    */
  def lsqFit(gram: Array[(Int, Int, Long)], ridge: Double = 1e-9)
      : Array[Double] = {
    val n = F + 1
    val a = Array.fill(n, n + 1)(0.0)
    gram.foreach { case (i, j, v) =>
      if (j == -1) a(i)(n) = v.toDouble
      else { a(i)(j) = v.toDouble; a(j)(i) = v.toDouble }
    }
    for (i <- 0 until n) a(i)(i) += ridge
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(p); a(p) = tmp
      for (r <- 0 until n if r != c && a(c)(c) != 0.0) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c to n) a(r)(k) -= f * a(c)(k)
      }
    }
    Array.tabulate(n)(i => if (a(i)(i) == 0.0) 0.0 else a(i)(n) / a(i)(i))
  }

  /** Score docs with driver-solved probe weights (broadcast literal):
    * margin = sum over buckets of w(b) * cnt + bias, pred = sign.
    */
  def probeScore(docs: DataFrame, w: Array[Double]): DataFrame = {
    val wm = map(w.toIndexedSeq.zipWithIndex.flatMap { case (v, i) =>
      Seq(lit(i), lit(v)) }: _*)
    hashedFeatures(docs)
      .groupBy(col("doc_id"))
      .agg(sum(element_at(wm, col("bucket")) * col("cnt")).as("__m"))
      .join(docs.select(col("doc_id")), Seq("doc_id"), "right_outer")
      .select(col("doc_id"),
        (coalesce(col("__m"), lit(0.0)) + lit(w(F))).as("margin"))
      .withColumn("pred", when(col("margin") > 0, 1).otherwise(-1))
  }

  /** Driver entry + full oracle: the 3-feature (data-bucket,
    * key-bucket, bias) probe solved by CRAMER'S RULE in exact integer
    * arithmetic — w_i = det(A_i)/det(A), so
    * sign(w.x) = sign((x1 det(A_1) + x2 det(A_2) + det(A_3)) * sign(det A))
    * needs no division at all. Scores are determinant-scaled integer
    * margins (DECIMAL(38,0) Spark / HUGEINT DuckDB, emitted as
    * strings); pred is the recovered teacher label (99.7%+ of rows
    * at every tested SF — rank-deficiency aside, least squares is not
    * the teacher rule, MlOpsSpec pins the accuracy floor).
    * Magnitude bound: |det| <= ~6 (SUM x^2)^3 — fine through 38 digits
    * past a billion docs at these token counts; the full-F production
    * path ([[lsqFit]]) solves in doubles and has no such bound.
    */
  val qualityLsqScore: Q = Q("quality_lsq_score",
    (s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val feats = hashedFeatures(docs)
      def cnt(b: Int, n: String) = feats.filter(col("bucket") === b)
        .select(col("doc_id"), col("cnt").as(n))
      val d3 = docs.select(col("doc_id"))
        .join(cnt(DataBkt, "__x1"), Seq("doc_id"), "left_outer")
        .join(cnt(KeyBkt, "__x2"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("__x1"), lit(0L)).as("x1"),
          coalesce(col("__x2"), lit(0L)).as("x2"))
        .withColumn("y", when(col("x1") > col("x2"), 1L).otherwise(-1L))
      val dec = DecimalType(38, 0)
      val stats = d3.agg(
        sum(col("x1") * col("x1")).cast(dec).as("s11"),
        sum(col("x1") * col("x2")).cast(dec).as("s12"),
        sum(col("x1")).cast(dec).as("s13"),
        sum(col("x2") * col("x2")).cast(dec).as("s22"),
        sum(col("x2")).cast(dec).as("s23"),
        count(lit(1)).cast(dec).as("s33"),
        sum(col("x1") * col("y")).cast(dec).as("b1"),
        sum(col("x2") * col("y")).cast(dec).as("b2"),
        sum(col("y")).cast(dec).as("b3"))
      def det3(m: Array[Array[Column]]): Column =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
          m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
          m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      def aCol(r: Int, c: Int): Column = Seq(
        Seq(col("s11"), col("s12"), col("s13")),
        Seq(col("s12"), col("s22"), col("s23")),
        Seq(col("s13"), col("s23"), col("s33")))(r)(c)
      def bCol(r: Int): Column = Seq(col("b1"), col("b2"), col("b3"))(r)
      def detSub(i: Int): Column = det3(Array.tabulate(3, 3)((r, c) =>
        if (c == i) bCol(r) else aCol(r, c)))
      val dets = stats.select(
        det3(Array.tabulate(3, 3)((r, c) => aCol(r, c))).as("dd"),
        detSub(0).as("d1"), detSub(1).as("d2"), detSub(2).as("d3"))
      d3.crossJoin(broadcast(dets))
        .withColumn("__raw",
          col("x1").cast(dec) * col("d1") +
            col("x2").cast(dec) * col("d2") + col("d3"))
        .select(col("doc_id"),
          when(col("dd") >= 0, col("__raw")).otherwise(-col("__raw"))
            .cast("string").as("score"))
        .withColumn("pred",
          when(col("score").cast(dec) > 0, 1).otherwise(-1))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $oFeatures,
      |dx AS MATERIALIZED (
      |  SELECT d.doc_id,
      |    CAST(COALESCE(fd.cnt, 0) AS HUGEINT) x1,
      |    CAST(COALESCE(fk.cnt, 0) AS HUGEINT) x2,
      |    CASE WHEN COALESCE(fd.cnt, 0) > COALESCE(fk.cnt, 0)
      |         THEN CAST(1 AS HUGEINT) ELSE CAST(-1 AS HUGEINT) END y
      |  FROM documents d
      |  LEFT JOIN feats fd ON d.doc_id = fd.doc_id AND fd.bucket = $DataBkt
      |  LEFT JOIN feats fk ON d.doc_id = fk.doc_id AND fk.bucket = $KeyBkt),
      |st AS MATERIALIZED (
      |  SELECT SUM(x1*x1) s11, SUM(x1*x2) s12, SUM(x1) s13,
      |         SUM(x2*x2) s22, SUM(x2) s23, CAST(COUNT(*) AS HUGEINT) s33,
      |         SUM(x1*y) b1, SUM(x2*y) b2, SUM(y) b3
      |  FROM dx),
      |dets AS MATERIALIZED (
      |  SELECT
      |    s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
      |      + s13*(s12*s23 - s22*s13) AS dd,
      |    b1*(s22*s33 - s23*s23) - s12*(b2*s33 - b3*s23)
      |      + s13*(b2*s23 - b3*s22) AS d1,
      |    s11*(b2*s33 - b3*s23) - b1*(s12*s33 - s23*s13)
      |      + s13*(s12*b3 - b2*s13) AS d2,
      |    s11*(s22*b3 - s23*b2) - s12*(s12*b3 - b2*s13)
      |      + b1*(s12*s23 - s22*s13) AS d3
      |  FROM st)
      |SELECT doc_id,
      |  CAST(CASE WHEN dd >= 0 THEN x1*d1 + x2*d2 + d3
      |            ELSE -(x1*d1 + x2*d2 + d3) END AS VARCHAR) score,
      |  CAST(CASE WHEN (CASE WHEN dd >= 0 THEN x1*d1 + x2*d2 + d3
      |                       ELSE -(x1*d1 + x2*d2 + d3) END) > 0
      |            THEN 1 ELSE -1 END AS INT) pred
      |FROM dx, dets ORDER BY doc_id""".stripMargin))

  val defs: Seq[Q] = Seq(kmeansUpdate, semanticDedupQ, qualityGram,
    qualityLsqScore)
}
