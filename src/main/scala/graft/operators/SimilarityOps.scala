package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float>, dim 64).
  *
  * Two paths:
  *  - brute force: broadcast the (small) query set, codegen'd dot product
  *    against every row, per-query top-k via window. Linear scan — the
  *    exact baseline, shuffle-free except the final top-k.
  *  - LSH-bucketed: random-hyperplane signs bucket the corpus; candidates
  *    are scored only within the query's bucket. The scale path: the scan
  *    is pruned to matching buckets (at 100 TB the bucket id becomes a
  *    partition/cluster key so the scan prunes to ~1/2^bits of the data).
  */
object SimilarityOps {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  /** Double dot product as a strict left fold. Cross-engine deterministic:
    * float->double widening is exact, per-element double products are
    * IEEE-identical, and the sequential fold fixes the association order —
    * DuckDB's list_reduce folds in the same order, so the oracle matches
    * bit-for-bit. Runs as the native codegen'd DotVec kernel: the
    * interpreted aggregate/zip_with pipeline costs ~10x on pair-scoring
    * hot paths (same trap as the text signatures, NOTES.md).
    */
  private def dotDouble(a: Column, b: Column): Column =
    call_function("dot_vec", a, b)

  /** Fixed random hyperplanes (seeded) for sign-LSH bucketing. */
  private def hyperplanes(bits: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(7)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Brute-force top-5 neighbours by dot product for query vectors
    * (vec_id < 10), excluding self. Oracle-checked: the decimal dot is
    * bit-identical in DuckDB.
    */
  val bruteForce: Q = Q("sim_topk_dot",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .filter(col("qid") < 10)
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          dotDouble(col("qe"), col("embedding")).as("dot"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("dot").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("vec_id"), col("dot"))
        .orderBy(col("qid"), col("dot").desc, col("vec_id"))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      |           WHERE vec_id < 10),
      |p AS (
      |  SELECT q.qid, e.vec_id,
      |    LIST_REDUCE(
      |      LIST_PREPEND(CAST(0.0 AS DOUBLE),
      |        LIST_TRANSFORM(LIST_ZIP(q.qe, e.embedding),
      |          pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))),
      |      (acc, x) -> acc + x) AS dot
      |  FROM q, embeddings e
      |  WHERE q.qid <> e.vec_id),
      |r AS (SELECT qid, vec_id, dot,
      |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) rn
      |      FROM p)
      |SELECT qid, vec_id, dot FROM r WHERE rn <= 5
      |ORDER BY qid, dot DESC, vec_id""".stripMargin))

  /** Sign-LSH approximate neighbours: 8-bit hyperplane-sign bucket per
    * vector; top-3 per query within its bucket. Rows-only check (bucket
    * layout is engine-internal).
    */
  /** Sign-LSH bucketed neighbour pipeline. `planted = false` is the
    * organic semantic: top-3 per query within its sign bucket (the
    * operator property the boundedness spec pins). `planted = true`
    * unions identical twins of the query vectors and projects the twin
    * matches — an identical vector lands in the identical sign-bucket,
    * so each query must recover its twin through the bucket join, which
    * makes the kernel + join hash-checkable by the driver's DuckDB gate
    * (the score is the sequential-fold self-dot, the same bit-exact
    * mirror sim_topk_dot uses).
    */
  def lshBucket(s: SparkSession, d: String, planted: Boolean): DataFrame = {
    val planes = hyperplanes(8, 64)
    // packed sign signature via the SignBits kernel (bit i = plane i,
    // same bucket values as the per-plane sum it replaces)
    def bucket(e: Column): Column =
      call_function("sign_bits", e,
        array(planes.map(p => array(p.map(lit): _*)): _*)).cast("int")
    val raw = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val base = if (!planted) raw else
      raw.unionByName(raw.filter(col("vec_id") < 10)
        .withColumn("vec_id", col("vec_id") + DedupOps.TwinOffset))
    val emb = base
      .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bkt"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bkt").as("qbkt"))
    val cand = emb.join(broadcast(q),
        col("bkt") === col("qbkt") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        dotDouble(col("qe"), col("embedding")).as("score"))
    if (planted)
      cand.filter(col("vec_id") === col("qid") + DedupOps.TwinOffset)
        .orderBy(col("qid"))
    else {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("vec_id"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id"), col("score"))
        .orderBy(col("qid"), col("score").desc, col("vec_id"))
    }
  }

  val bucketed: Q = Q("sim_lsh_bucket",
    (s, d) => lshBucket(s, d, planted = true),
    Some("""SELECT vec_id AS qid, vec_id + 10000000 AS vec_id,
      |  LIST_REDUCE(
      |    LIST_PREPEND(CAST(0.0 AS DOUBLE),
      |      LIST_TRANSFORM(LIST_ZIP(embedding, embedding),
      |        pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))),
      |    (acc, x) -> acc + x) AS score
      |FROM embeddings WHERE vec_id < 10 ORDER BY qid""".stripMargin))

  /** Coarse-quantizer k-means fit (Lloyd's) on a bounded sample.
    *
    * Scale design: the quantizer trains on a deterministic hash-bucketed
    * sample capped at `FitCap` vectors, collected ONCE and iterated on
    * the driver — the standard IVF training recipe (a coarse quantizer
    * needs ~100-1000 samples per cell, not the corpus; at 100 TB the
    * sample is the same bounded size). This removes every per-iteration
    * distributed job AND the per-iteration whole-stage-codegen compile of
    * the k*dim-literal distance expression — the full corpus is scanned
    * exactly once, in the final cell assignment, against a broadcast of
    * k*dim doubles. Deterministic: hash-sliced sample, vec_id-ordered
    * cap, first-k init, no RNG; empty cells keep their previous centroid
    * so k never silently degrades.
    */
  private val FitCap = 4096

  /** The bounded, deterministic training sample shared by every quantizer
    * fit (coarse IVF cells and PQ codebooks): hash-sliced, vec_id-ordered,
    * capped — the same size at any corpus scale.
    */
  private def fitSample(emb: DataFrame): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = emb
      .filter(pmod(xxhash64(col("vec_id")), lit(4)) === 0)
      .orderBy(col("vec_id"))
      .limit(FitCap)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty embeddings input")
    sample
  }

  /** Driver-side Lloyd's over an in-memory sample (see fitSample). */
  private def lloyd(sample: Array[Array[Double]], k: Int, iters: Int)
      : Array[Array[Double]] = {
    val dim = sample.head.length
    var cents = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      for (v <- sample) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0; var i = 0
          val ct = cents(c)
          while (i < dim) { val x = v(i) - ct(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(math.min(k, cents.length)) { c =>
        if (counts(c) == 0) cents(c)
        else { val s = sums(c); Array.tabulate(dim)(i => s(i) / counts(c)) }
      }
    }
    cents
  }

  private def kmeansCentroids(emb: DataFrame, k: Int, iters: Int)
      : Array[Array[Double]] =
    lloyd(fitSample(emb), k, iters)

  /** Per-subspace PQ codebooks: the embedding is cut into `m` contiguous
    * sub-vectors and each subspace gets its own k-means codebook, trained
    * on the same bounded sample as the coarse quantizer.
    * Returns books(subspace)(code) = centroid sub-vector.
    */
  private def pqCodebooks(sample: Array[Array[Double]], m: Int, k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { mi =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      lloyd(slice, k, iters)
    }
  }

  /** Per-centroid comparison keys for nearest-centroid selection:
    * c.c - 2 x.c, which orders identically to the squared distance
    * ||x-c||^2 = x.x - 2 x.c + c.c (x.x is constant across centroids).
    * Runs on the CellDists kernel — one loop nest over the broadcast
    * centroid matrix instead of a k-wide literal expression tree (the
    * SignBits lesson at quantizer scale). Callers only argmin / rank
    * these, never read them as true distances.
    */
  private def centroidDists(cents: Array[Array[Double]]): Column =
    call_function("cell_dists", col("embedding"),
      array(cents.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*))

  /** Squared distance to each centroid, argmin -> cell id. */
  private def assignCell(df: DataFrame, cents: Array[Array[Double]]): DataFrame =
    df.withColumn("__d", centroidDists(cents))
      .withColumn("cell",
        (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .drop("__d")

  /** The `nprobe` nearest cell ids, closest first. */
  private def nearestCells(df: DataFrame, cents: Array[Array[Double]],
      nprobe: Int): DataFrame =
    df.withColumn("__d", centroidDists(cents))
      .withColumn("cells",
        slice(
          transform(
            array_sort(zip_with(col("__d"),
              sequence(lit(0), lit(cents.length - 1)),
              (d, i) => struct(d.as("d"), i.as("i")))),
            x => x.getField("i").cast("int")),
          1, nprobe))
      .drop("__d")

  /** IVF approximate top-k: coarse k-means quantizer, probe the nprobe
    * nearest cells only. The scale path: with cell as a partition/cluster
    * key, the candidate scan prunes to ~nprobe/k of the corpus.
    */
  /** IVF pipeline. `planted = false` is the organic semantic: probe the
    * nprobe nearest cells, top-3 per query (the recall-floor spec's
    * subject). `planted = true` unions identical twins of the query
    * vectors and projects the twin matches — an identical vector is
    * assigned the query's own nearest cell (argmin and first-probe
    * tie-breaks both pick the smallest centroid index), so every query
    * must recover its twin through the nprobe-cell candidate scan: the
    * quantizer assignment + pruned join become hash-checkable by the
    * driver's DuckDB gate.
    */
  def ivfTopK(s: SparkSession, d: String, planted: Boolean,
      nprobe: Int = 2): DataFrame = {
    Engine.configure(s)
    val raw = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val emb = if (!planted) raw else
      raw.unionByName(raw.filter(col("vec_id") < 10)
        .withColumn("vec_id", col("vec_id") + DedupOps.TwinOffset))
    val cents = kmeansCentroids(emb, k = 16, iters = 3)
    val cells = assignCell(emb, cents)
    // probe the query's nprobe nearest cells (default 2): recovers most
    // cell-border near-misses for ~nprobe/k of the corpus scanned per
    // query — recall is monotone in nprobe (OrganicRecallSpec pins the
    // {1,2,4} grid) and nprobe = k degenerates to the exact linear scan
    val q = nearestCells(emb.filter(col("vec_id") < 10), cents, nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(col("cells")).as("qcell"))
    val cand = cells.join(broadcast(q),
        col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        dotDouble(col("qe"), col("embedding")).as("score"))
    if (planted)
      cand.filter(col("vec_id") === col("qid") + DedupOps.TwinOffset)
        .orderBy(col("qid"))
    else {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("vec_id"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id"), col("score"))
        .orderBy(col("qid"), col("score").desc, col("vec_id"))
    }
  }

  val ivf: Q = Q("sim_ivf",
    (s, d) => ivfTopK(s, d, planted = true),
    Some("""SELECT vec_id AS qid, vec_id + 10000000 AS vec_id,
      |  LIST_REDUCE(
      |    LIST_PREPEND(CAST(0.0 AS DOUBLE),
      |      LIST_TRANSFORM(LIST_ZIP(embedding, embedding),
      |        pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))),
      |    (acc, x) -> acc + x) AS score
      |FROM embeddings WHERE vec_id < 10 ORDER BY qid""".stripMargin))

  /** IVF-PQ approximate top-k: coarse cells prune the scan (as in sim_ivf)
    * and candidates are scored from 8-byte PQ CODES via asymmetric
    * distance computation (ADC) — the original vectors are never fetched
    * on the scoring path.
    *
    * Scale design (the reason PQ exists): at 100 TB of raw float
    * embeddings the codes table is ~1/32 the bytes (m=8 one-byte codes vs
    * 64 floats), so the candidate scan reads the small codes relation
    * only. Scoring is `sum_m q_m . codebook_m[code_m]` — per subspace a
    * codegen'd dot_vec of the query's sub-vector against the codebook
    * entry selected by the stored code (element_at over a broadcast
    * literal codebook). Codebooks train on the same bounded driver-side
    * sample as the coarse quantizer (see fitSample). A final exact
    * re-rank refines the ADC top-24 shortlist per query — the only rows
    * whose original vectors are ever read.
    */
  /** IVF-PQ pipeline. `planted = false` is the organic semantic: ADC
    * shortlist from codes, exact re-rank, top-3 per query (IvfSpec pins
    * determinism, boundedness and the recall floor). `planted = true`
    * unions identical twins of the query vectors and projects the twin
    * matches: an identical vector gets the identical cell AND identical
    * PQ codes, its ADC score is the query's self-ADC (the max-dot
    * approximation), so every query must recover its twin through the
    * quantized top-24 shortlist — and the FINAL value is the exact
    * re-ranked sequential-fold self-dot, the bit-exact mirror the
    * sim_ivf oracle already uses.
    */
  def pqTopK(s: SparkSession, d: String, planted: Boolean): DataFrame = {
      Engine.configure(s)
      val M = 8; val Ksub = 32; val SubDim = 8
      val raw = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val emb = if (!planted) raw else
        raw.unionByName(raw.filter(col("vec_id") < 10)
          .withColumn("vec_id", col("vec_id") + DedupOps.TwinOffset))
      val sample = fitSample(emb)
      val cents = lloyd(sample, 16, 3)
      val books = pqCodebooks(sample, M, Ksub, 3)

      // encode: per subspace, argmin ||x_m - c||^2 == argmax
      // (x_m.c - |c|^2/2) — the PqEncode kernel runs every subspace's
      // first-argmax in one loop nest over the broadcast codebooks
      // (the M*K-literal expression tree it replaces took seconds to
      // JIT and evaluated interpreted)
      val booksLit = array(books.toIndexedSeq.map(book =>
        array(book.toIndexedSeq.map(c =>
          array(c.toIndexedSeq.map(lit): _*)): _*)): _*)
      val codes = assignCell(emb, cents).select(
        col("vec_id"), col("cell"),
        call_function("pq_encode", col("embedding"), booksLit).as("codes"))

      val q = nearestCells(emb.filter(col("vec_id") < 10), cents, nprobe = 2)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(col("cells")).as("qcell"))

      // ADC: dot approximated from codes alone (PqAdc kernel — the
      // query sub-vectors against the code-selected centroids, summed
      // in subspace order)
      val adc = call_function("pq_adc", col("qe"), col("codes"), booksLit)

      // ADC shortlist from codes only, then exact re-rank of the
      // shortlist (the standard IVFPQ refine step: original vectors are
      // fetched for <= 10 rows per query, not for the scan)
      val wAdc = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("vec_id"))
      val shortlist = codes.join(broadcast(q),
          col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), adc.as("score"))
        .withColumn("rn", row_number().over(wAdc))
        .filter(col("rn") <= 24) // refine factor 8x the final k
        .select(col("qid"), col("vec_id"))
      val qv = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val exact = shortlist
        .join(emb, "vec_id")
        .join(broadcast(qv), "qid")
        .select(col("qid"), col("vec_id"),
          dotDouble(col("qe"), col("embedding")).as("score"))
      if (planted)
        exact.filter(col("vec_id") === col("qid") + DedupOps.TwinOffset)
          .orderBy(col("qid"))
      else {
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("vec_id"))
        exact.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("qid"), col("vec_id"), col("score"))
          .orderBy(col("qid"), col("score").desc, col("vec_id"))
      }
  }

  val pq: Q = Q("sim_pq",
    (s, d) => pqTopK(s, d, planted = true),
    Some("""SELECT vec_id AS qid, vec_id + 10000000 AS vec_id,
      |  LIST_REDUCE(
      |    LIST_PREPEND(CAST(0.0 AS DOUBLE),
      |      LIST_TRANSFORM(LIST_ZIP(embedding, embedding),
      |        pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))),
      |    (acc, x) -> acc + x) AS score
      |FROM embeddings WHERE vec_id < 10 ORDER BY qid""".stripMargin))

  /** Oracle-SQL generator for [[mmr]]: the greedy selection unrolled as
    * one (pick, state) CTE pair per rank — pick = per-query argmax of
    * `0.5*rel - 0.5*ms` (ties to the smaller vec_id), state update =
    * GREATEST(ms, dot(cand, pick)) with the dot as the same
    * sequential-fold LIST_REDUCE the relevance side uses. Every double
    * op mirrors the kernel exactly, so the selected ID sequence
    * hash-matches even though the scores are floats.
    */
  private def mmrOracleSql(kCand: Int, kSel: Int): String = {
    def fold(a: String, b: String): String =
      s"""LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
         |      LIST_TRANSFORM(LIST_ZIP($a, $b),
         |        pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))),
         |      (acc, x) -> acc + x)""".stripMargin
    val stages = (1 to kSel).map { i =>
      s"""pick$i AS MATERIALIZED (
         |  SELECT qid, vec_id, emb FROM (
         |    SELECT qid, vec_id, emb, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY 0.5 * rel - 0.5 * ms DESC, vec_id) rn
         |    FROM st${i - 1}) WHERE rn = 1),
         |st$i AS MATERIALIZED (
         |  SELECT s.qid, s.vec_id, s.rel, s.emb,
         |    GREATEST(s.ms, ${fold("s.emb", "p.emb")}) ms
         |  FROM st${i - 1} s JOIN pick$i p USING (qid)
         |  WHERE s.vec_id <> p.vec_id)""".stripMargin
    }.mkString(",\n")
    val ranks = (1 to kSel).map(i =>
      s"  SELECT qid, $i AS rank, vec_id FROM pick$i")
      .mkString("  UNION ALL\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |           WHERE vec_id < 10),
       |p0 AS (
       |  SELECT q.qid, e.vec_id, e.embedding emb,
       |    ${fold("q.qe", "e.embedding")} rel
       |  FROM q, embeddings e WHERE q.qid <> e.vec_id),
       |st0 AS MATERIALIZED (
       |  SELECT qid, vec_id, rel, emb, CAST(0.0 AS DOUBLE) ms FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY rel DESC, vec_id) rn FROM p0) WHERE rn <= $kCand),
       |$stages
       |SELECT qid, CAST(rank AS INT) rank, vec_id FROM (
       |$ranks
       |) ORDER BY qid, rank""".stripMargin
  }

  /** MMR diversified retrieval (Carbonell & Goldstein 1998): brute-force
    * top-24 candidates per query (the sim_topk_dot shape — broadcast
    * query set, one window), then greedy re-rank to 8 via ONE
    * [[graft.functions.MmrSelect]] kernel call per query — the
    * selection loop never leaves the executor, and candidates carry
    * their vectors once through the per-query groupBy (24 x 64 floats
    * per query, bounded). Output is the integer (qid, rank, vec_id)
    * sequence; all score arithmetic is sequential-fold double, so the
    * DuckDB oracle replays the greedy selection exactly (generated
    * unrolled stages above).
    */
  val mmr: Q = Q("sim_mmr",
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .filter(col("qid") < 10)
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          dotDouble(col("qe"), col("embedding")).as("rel"), col("embedding"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("rel").desc, col("vec_id"))
      val cands = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 24)
      cands.groupBy(col("qid"))
        .agg(collect_list(struct(col("vec_id"), col("rel"),
          col("embedding"))).as("cs"))
        .select(col("qid"),
          posexplode(call_function("mmr_select", col("cs"), lit(8)))
            .as(Seq("r0", "vec_id")))
        .select(col("qid"), (col("r0") + 1).cast("int").as("rank"),
          col("vec_id"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(mmrOracleSql(kCand = 24, kSel = 8)))

  /** Symmetric int8 embedding quantization (per-vector absmax scale,
    * the standard activation/embedding compression recipe): q_i =
    * floor(v_i * 127 / absmax + 0.5), dequant error <= absmax/254 per
    * component, 4x smaller vectors. Purely map-side (scales with
    * splits). Cross-engine determinism: floor(x + 0.5) instead of
    * round() — floor is defined identically in both engines at every
    * input, so there is no half-tie rounding-mode hazard; the checked
    * surface is the per-vector integer code sums/extremes plus the
    * raw absmax (a stored float, bit-identical).
    */
  val quantizeInt8: Q = Q("embed_quantize_int8",
    (s, d) => {
      val amax = array_max(transform(col("embedding"),
        x => abs(x.cast("double"))))
      t(s, d, "embeddings")
        .withColumn("absmax", amax)
        .withColumn("q", transform(col("embedding"), x =>
          when(col("absmax") === 0.0, 0L)
            .otherwise(floor(x.cast("double") * lit(127.0) / col("absmax")
              + lit(0.5)).cast("long"))))
        .select(col("vec_id"), col("absmax"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
          array_min(col("q")).as("qmin"), array_max(col("q")).as("qmax"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH a AS (
      |  SELECT vec_id, embedding,
      |    LIST_MAX(LIST_TRANSFORM(embedding,
      |      x -> ABS(CAST(x AS DOUBLE)))) absmax
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, absmax,
      |    LIST_TRANSFORM(embedding, x ->
      |      CASE WHEN absmax = 0.0 THEN CAST(0 AS BIGINT)
      |           ELSE CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / absmax + 0.5)
      |                     AS BIGINT) END) qs
      |  FROM a)
      |SELECT vec_id, absmax,
      |  LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), qs),
      |    (acc, x) -> acc + x) qsum,
      |  LIST_MIN(qs) qmin, LIST_MAX(qs) qmax
      |FROM q ORDER BY vec_id""".stripMargin))

  val defs: Seq[Q] = Seq(bruteForce, bucketed, ivf, pq, mmr, quantizeInt8)
}
