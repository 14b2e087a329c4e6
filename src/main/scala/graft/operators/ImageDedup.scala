package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image near-duplicate detection via difference hash (dHash) —
  * completing the multimodal half of the dedup family: text has
  * MinHash/SimHash/substring, embeddings have sign-LSH/SemDeDup, and
  * images get the perceptual-hash pipeline every multimodal corpus
  * dedups with (dHash/pHash + Hamming banding): decode -> grayscale
  * grid -> horizontal gradient signs -> 56-bit hash -> band-bucketed
  * candidate pairs -> exact Hamming verify.
  *
  * 100 TB shape: the decode+hash is fused into the scan
  * (mapPartitions over the binary payloads, 8 output bytes per image
  * — the payload never shuffles, the [[MultimodalOps]] contract); the
  * join is SimHash-style Hamming LSH — 8 bands x 7 bits, a pair at
  * Hamming <= h collides on >= (8 - h) bands, so band equality is a
  * complete blocking for h <= 7 — then one exact bit_count verify per
  * candidate.
  *
  * Oracle: images are the deterministic grayscale quadratic-residue
  * pattern (pixel = ((k%65536)^2 / 256) % 256 with k linear in
  * (id, x, y)); the Spark side DECODES real PPM bytes while DuckDB
  * recomputes the pixels, the hash, and the quadratic Hamming join
  * analytically — a decode-, hash- or banding-level bug hash-fails.
  * Planted twins (one pixel +128 mod 256) land at Hamming 0-2;
  * organic near-pairs are rare by construction (pseudo-random bits).
  */
object ImageDedup {

  /** Deterministic grayscale pixel both engines can compute. */
  def pixel(docId: Long, x: Int, y: Int): Int = {
    val k = docId * 2654435761L + x * 40503L + y * 65599L
    val m = k % 65536L
    ((m * m / 256L) % 256L).toInt
  }

  /** 8x8 grayscale PPM payload; the twin variant perturbs pixel (3,4)
    * by +128 mod 256 (a near-duplicate, not an identical copy).
    */
  def grayPpmPayload(docId: Long, twin: Boolean): Array[Byte] = {
    val rgb = new Array[Byte](8 * 8 * 3)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var p = pixel(docId, x, y)
        if (twin && x == 3 && y == 4) p = (p + 128) % 256
        val i = (y * 8 + x) * 3
        rgb(i) = p.toByte; rgb(i + 1) = p.toByte; rgb(i + 2) = p.toByte
        x += 1
      }
      y += 1
    }
    RawImage.encodePpm(RawImage.Image(8, 8, rgb))
  }

  /** dHash of a decoded 8x8 image: bit k(y*7+x) = 1 iff
    * gray(x,y) < gray(x+1,y) — 56 horizontal gradient signs.
    */
  def dhashOf(img: RawImage.Image): Long = {
    var bits = 0L
    var k = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        val a = img.rgb((y * 8 + x) * 3) & 0xff
        val b = img.rgb((y * 8 + x + 1) * 3) & 0xff
        if (a < b) bits |= 1L << k
        k += 1
        x += 1
      }
      y += 1
    }
    bits
  }

  final case class ImgHash(doc_id: Long, dhash: Long)

  /** Decode + hash every document's image (plus its planted twin at
    * id + 10,000,000) through the REAL PPM codec.
    */
  def hashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // decode is the expensive per-row step; fan the single-row-group
    // scan out so it runs at full parallelism (guide §2.5 — measured
    // 1.66 s serial decode stage at sf0.1 before the fan-out)
    val ids = Engine.fanOut(Engine.table(s, d, "documents")
      .select(col("doc_id")), col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.flatMap { id =>
        // twin id must not collide with a real doc_id, else the pair
        // table silently corrupts (doc_a < doc_b suppresses dup rows).
        // Loud guard on the band contract (ZOrder/Hilbert precedent):
        // every real id keeps its low-8-digit residue below 1e7, so
        // the twin band [1e7, 2e7) within each 1e8 block is free —
        // true for the driver SFs (ids < 1e7) AND the 10x/100x sweep
        // layout (id += k*1e8)
        require(id >= 0 && id % 100000000L < 10000000L,
          s"imageDedup: doc_id $id violates the twin-band contract " +
            "(id % 1e8 must be < 1e7) — twin arithmetic (+1e7) would " +
            "collide with real ids")
        val base = RawImage.decodePpm(grayPpmPayload(id, twin = false))
        val tw = RawImage.decodePpm(grayPpmPayload(id, twin = true))
        Iterator(ImgHash(id, dhashOf(base)),
          ImgHash(id + 10000000L, dhashOf(tw)))
      }
    }.toDF()
  }

  /** Near-dup pairs at Hamming <= maxHam via 8x7-bit band blocking +
    * exact verify.
    */
  def nearDupPairs(hashes: DataFrame, maxHam: Int): DataFrame = {
    require(maxHam <= 7,
      "band blocking is complete only for maxHam <= 7 (8 bands)")
    val banded = hashes.select(col("doc_id"), col("dhash"),
      explode(array((0 until 8).map(i =>
        struct(lit(i).as("band_idx"),
          shiftright(col("dhash"), 7 * i).bitwiseAND(lit(0x7fL))
            .as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("dhash"),
        col("b.band_idx"), col("b.band_val"))
    val a = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("doc_a"), col("dhash").as("ha"))
    val b = banded.select(col("band_idx").as("bi2"),
      col("band_val").as("bv2"),
      col("doc_id").as("doc_b"), col("dhash").as("hb"))
    a.join(b, col("band_idx") === col("bi2") &&
        col("band_val") === col("bv2") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHam)
      .distinct()
  }

  /** Driver entry + FULL oracle: decode-hash-band-verify end to end;
    * DuckDB re-derives pixels, hashes and the quadratic Hamming join
    * from the shared formula.
    */
  val dhashDedup: Q = Q("multimodal_dhash_dedup",
    (s, d) => {
      Engine.configure(s)
      nearDupPairs(hashes(s, d), maxHam = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH ids AS (
      |  SELECT doc_id, doc_id AS src, 0 AS tw FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, doc_id, 1 FROM documents),
      |g AS (
      |  SELECT i.doc_id, x, y, i.src,
      |    CASE WHEN i.tw = 1 AND x = 3 AND y = 4
      |         THEN 128 ELSE 0 END AS bump
      |  FROM ids i, RANGE(0, 8) tx(x), RANGE(0, 8) ty(y)),
      |m AS (
      |  SELECT doc_id, x, y, bump,
      |    (src * 2654435761 + x * 40503 + y * 65599) % 65536 AS mv
      |  FROM g),
      |pxm AS (
      |  SELECT doc_id, x, y, ((mv * mv // 256) % 256 + bump) % 256 AS p
      |  FROM m),
      |dh AS (
      |  SELECT a.doc_id,
      |    CAST(SUM(CASE WHEN a.p < b.p
      |      THEN 1::BIGINT << CAST(a.y * 7 + a.x AS INT) ELSE 0 END)
      |      AS BIGINT) AS dhash
      |  FROM pxm a JOIN pxm b
      |    ON a.doc_id = b.doc_id AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 7
      |  GROUP BY a.doc_id)
      |SELECT h1.doc_id AS doc_a, h2.doc_id AS doc_b,
      |  CAST(BIT_COUNT(XOR(h1.dhash, h2.dhash)) AS INT) AS hamming
      |FROM dh h1 JOIN dh h2 ON h1.doc_id < h2.doc_id
      |WHERE BIT_COUNT(XOR(h1.dhash, h2.dhash)) <= 4
      |ORDER BY doc_a, doc_b""".stripMargin))

  // ---- video: frame-fingerprint dedup ------------------------------

  /** Deterministic luma for frame f of a doc's video. */
  def lumaPixel(docId: Long, f: Int, x: Int, y: Int): Int = {
    val k = docId * 2654435761L + f * 99991L + x * 40503L + y * 65599L
    val m = k % 65536L
    ((m * m / 256L) % 256L).toInt
  }

  /** 6-frame 8x8 Y4M payload; the twin perturbs ONE pixel of frame 2
    * (a sampled frame) by +128 — a near-duplicate video whose other
    * sampled frames fingerprint identically.
    */
  def y4mQrPayload(docId: Long, twin: Boolean): Array[Byte] = {
    val lumas = (0 until 6).map { f =>
      val l = new Array[Byte](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var p = lumaPixel(docId, f, x, y)
          if (twin && f == 2 && x == 3 && y == 4) p = (p + 128) % 256
          l(y * 8 + x) = p.toByte
          x += 1
        }
        y += 1
      }
      l
    }
    RawVideo.encodeY4m(8, 8, 25, 1, lumas)
  }

  /** dHash of one 8x8 luma plane. */
  def lumaDhash(luma: Array[Byte]): Long = {
    var bits = 0L
    var k = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if ((luma(y * 8 + x) & 0xff) < (luma(y * 8 + x + 1) & 0xff))
          bits |= 1L << k
        k += 1
        x += 1
      }
      y += 1
    }
    bits
  }

  final case class FrameHash(doc_id: Long, f: Int, dhash: Long)

  /** Video near-dup via frame fingerprints (the content-ID shape):
    * decode the REAL Y4M stream, dHash every OTHER frame (0, 2, 4),
    * equi-join videos on any equal (frame_idx, hash), keep pairs
    * matching on >= 2 of the 3 sampled frames. Signature is 24 bytes
    * per video whatever its length; the join is an ordinary shuffled
    * equi-join on the fingerprint key — no pairwise video comparison
    * ever happens. DuckDB recomputes frames, hashes and the
    * match-count join analytically from the shared luma formula.
    */
  val videoDhashDedup: Q = Q("multimodal_video_dhash",
    (s, d) => {
      Engine.configure(s)
      import s.implicits._
      val ids = Engine.table(s, d, "documents")
        .select(col("doc_id")).as[Long]
      val fh = ids.mapPartitions { it =>
        it.flatMap { id =>
          def hashesOf(docId: Long, twin: Boolean): Seq[FrameHash] = {
            val v = RawVideo.decodeY4m(y4mQrPayload(id, twin))
            Seq(0, 2, 4).map(f =>
              FrameHash(docId, f, lumaDhash(v.frames(f).luma)))
          }
          require(id >= 0 && id % 100000000L < 10000000L,
            s"videoDedup: doc_id $id violates the twin-band contract " +
              "(id % 1e8 < 1e7) — twin arithmetic would collide")
          hashesOf(id, twin = false) ++
            hashesOf(id + 10000000L, twin = true)
        }
      }.toDF()
      val a = fh.select(col("f"), col("dhash"), col("doc_id").as("doc_a"))
      val b = fh.select(col("f").as("f2"), col("dhash").as("h2"),
        col("doc_id").as("doc_b"))
      a.join(b, col("f") === col("f2") && col("dhash") === col("h2") &&
          col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).cast("int").as("frames_matched"))
        .filter(col("frames_matched") >= 2)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH ids AS (
      |  SELECT doc_id, doc_id AS src, 0 AS tw FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, doc_id, 1 FROM documents),
      |g AS (
      |  SELECT i.doc_id, f, x, y, i.src,
      |    CASE WHEN i.tw = 1 AND f = 2 AND x = 3 AND y = 4
      |         THEN 128 ELSE 0 END AS bump
      |  FROM ids i, UNNEST([0, 2, 4]) tf(f),
      |    RANGE(0, 8) tx(x), RANGE(0, 8) ty(y)),
      |m AS (
      |  SELECT doc_id, f, x, y, bump,
      |    (src * 2654435761 + f * 99991 + x * 40503 + y * 65599) % 65536
      |      AS mv
      |  FROM g),
      |pxm AS (
      |  SELECT doc_id, f, x, y,
      |    ((mv * mv // 256) % 256 + bump) % 256 AS p
      |  FROM m),
      |dh AS (
      |  SELECT a.doc_id, a.f,
      |    CAST(SUM(CASE WHEN a.p < b.p
      |      THEN 1::BIGINT << CAST(a.y * 7 + a.x AS INT) ELSE 0 END)
      |      AS BIGINT) AS dhash
      |  FROM pxm a JOIN pxm b
      |    ON a.doc_id = b.doc_id AND a.f = b.f AND b.y = a.y
      |      AND b.x = a.x + 1
      |  WHERE a.x < 7
      |  GROUP BY a.doc_id, a.f)
      |SELECT h1.doc_id AS doc_a, h2.doc_id AS doc_b,
      |  CAST(COUNT(*) AS INT) AS frames_matched
      |FROM dh h1 JOIN dh h2
      |  ON h1.f = h2.f AND h1.dhash = h2.dhash AND h1.doc_id < h2.doc_id
      |GROUP BY h1.doc_id, h2.doc_id
      |HAVING COUNT(*) >= 2
      |ORDER BY doc_a, doc_b""".stripMargin))

  // ---- audio: energy-gradient fingerprint dedup ---------------------

  /** Deterministic 16-bit PCM sample t of a doc's clip. */
  def audioSample(docId: Long, t: Int): Int = {
    val m = (docId * 2654435761L + t * 48271L) % 65536L
    (((m * m / 256L) % 65536L) - 32768L).toInt
  }

  /** 256-sample mono WAV; the twin wrap-shifts the 8 samples of
    * window 10 (t = 80..87) by +16384 — a re-encode-style perturbation
    * that moves one window's energy and leaves the rest untouched.
    */
  def wavQrPayload(docId: Long, twin: Boolean): Array[Byte] = {
    val s = new Array[Short](256)
    var t = 0
    while (t < 256) {
      var v = audioSample(docId, t)
      if (twin && t >= 80 && t < 88)
        v = ((v + 32768 + 16384) % 65536) - 32768
      s(t) = v.toShort
      t += 1
    }
    RawAudio.encodeWav(RawAudio.Clip(8000, 1, s))
  }

  /** Energy-gradient fingerprint: 32 windows of 8 samples, bit w = 1
    * iff sum|s| of window w < window w+1 — 31 bits, the dHash idea on
    * the time axis.
    */
  def audioFingerprint(samples: Array[Short]): Long = {
    val e = Array.tabulate(32) { w =>
      var sum = 0L
      var i = 0
      while (i < 8) { sum += math.abs(samples(w * 8 + i).toLong); i += 1 }
      sum
    }
    var bits = 0L
    var w = 0
    while (w < 31) {
      if (e(w) < e(w + 1)) bits |= 1L << w
      w += 1
    }
    bits
  }

  final case class AudioFp(doc_id: Long, fp: Long)

  /** Audio near-dup via the 31-bit energy-gradient fingerprint —
    * completing the image/video/audio perceptual-dedup trio. Decode
    * the REAL WAV bytes, fingerprint, band into 4 x 8 bits (complete
    * blocking for Hamming <= 3), verify <= 2. DuckDB recomputes
    * samples, window energies, bits and the quadratic Hamming join
    * from the shared formula.
    */
  val audioFpDedup: Q = Q("multimodal_audio_fp",
    (s, d) => {
      Engine.configure(s)
      import s.implicits._
      val ids = Engine.table(s, d, "documents")
        .select(col("doc_id")).as[Long]
      val fps = ids.mapPartitions { it =>
        it.flatMap { id =>
          require(id >= 0 && id % 100000000L < 10000000L,
            s"audioDedup: doc_id $id violates the twin-band contract " +
              "(id % 1e8 < 1e7) — twin arithmetic would collide")
          val base = RawAudio.decodeWav(wavQrPayload(id, twin = false))
          val tw = RawAudio.decodeWav(wavQrPayload(id, twin = true))
          Iterator(AudioFp(id, audioFingerprint(base.samples)),
            AudioFp(id + 10000000L, audioFingerprint(tw.samples)))
        }
      }.toDF()
      val banded = fps.select(col("doc_id"), col("fp"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band_idx"),
            shiftright(col("fp"), 8 * i).bitwiseAND(lit(0xffL))
              .as("band_val"))): _*)).as("b"))
        .select(col("doc_id"), col("fp"),
          col("b.band_idx"), col("b.band_val"))
      val a = banded.select(col("band_idx"), col("band_val"),
        col("doc_id").as("doc_a"), col("fp").as("fa"))
      val b = banded.select(col("band_idx").as("bi2"),
        col("band_val").as("bv2"),
        col("doc_id").as("doc_b"), col("fp").as("fb"))
      a.join(b, col("band_idx") === col("bi2") &&
          col("band_val") === col("bv2") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("fa").bitwiseXOR(col("fb"))).as("hamming"))
        .filter(col("hamming") <= 2)
        .distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH ids AS (
      |  SELECT doc_id, doc_id AS src, 0 AS tw FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, doc_id, 1 FROM documents),
      |g AS (
      |  SELECT i.doc_id, t, i.src,
      |    CASE WHEN i.tw = 1 AND t >= 80 AND t < 88
      |         THEN 1 ELSE 0 END AS bump
      |  FROM ids i, RANGE(0, 256) tt(t)),
      |m AS (
      |  SELECT doc_id, t, bump,
      |    (src * 2654435761 + t * 48271) % 65536 AS mv
      |  FROM g),
      |sm AS (
      |  SELECT doc_id, t,
      |    CASE WHEN bump = 1
      |      THEN ((((mv * mv // 256) % 65536 - 32768) + 32768 + 16384)
      |            % 65536) - 32768
      |      ELSE (mv * mv // 256) % 65536 - 32768
      |    END AS s
      |  FROM m),
      |en AS (
      |  SELECT doc_id, t // 8 AS w, SUM(ABS(s)) AS e
      |  FROM sm GROUP BY doc_id, t // 8),
      |fp AS (
      |  SELECT a.doc_id,
      |    CAST(SUM(CASE WHEN a.e < b.e
      |      THEN 1::BIGINT << CAST(a.w AS INT) ELSE 0 END) AS BIGINT)
      |      AS fp
      |  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.w = a.w + 1
      |  WHERE a.w < 31
      |  GROUP BY a.doc_id)
      |SELECT f1.doc_id AS doc_a, f2.doc_id AS doc_b,
      |  CAST(BIT_COUNT(XOR(f1.fp, f2.fp)) AS INT) AS hamming
      |FROM fp f1 JOIN fp f2 ON f1.doc_id < f2.doc_id
      |WHERE BIT_COUNT(XOR(f1.fp, f2.fp)) <= 2
      |ORDER BY doc_a, doc_b""".stripMargin))

  val defs: Seq[Q] = Seq(dhashDedup, videoDhashDedup, audioFpDedup)
}
