package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageDedup, RawImage}

/** Pins for perceptual-hash image dedup: the decode path and the
  * analytic pixel formula agree (the oracle's premise), band blocking
  * is COMPLETE for the verified Hamming radius, and twins land at
  * Hamming <= 2 while organic pairs stay rare.
  */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decoded PPM pixels equal the analytic formula (base and twin)") {
    for (id <- Seq(0L, 7L, 123L); twin <- Seq(false, true)) {
      val img = RawImage.decodePpm(ImageDedup.grayPpmPayload(id, twin))
      for (y <- 0 until 8; x <- 0 until 8) {
        val want0 = ImageDedup.pixel(id, x, y)
        val want = if (twin && x == 3 && y == 4) (want0 + 128) % 256
          else want0
        val got = img.rgb((y * 8 + x) * 3) & 0xff
        assert(got == want, s"id=$id twin=$twin ($x,$y)")
      }
    }
  }

  test("band blocking is complete: every pair at Hamming <= 7 shares " +
    "a band (pigeonhole, verified exhaustively on perturbations)") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val h = rnd.nextLong() & ((1L << 56) - 1)
      val flips = rnd.nextInt(8) // 0..7 bit flips
      var h2 = h
      for (_ <- 1 to flips) h2 ^= 1L << rnd.nextInt(56)
      val shared = (0 until 8).exists(i =>
        ((h >> (7 * i)) & 0x7f) == ((h2 >> (7 * i)) & 0x7f))
      assert(shared, s"h=$h flips=$flips")
    }
  }

  test("video twins match on exactly the 2 unperturbed sampled frames; " +
    "decoded luma equals the analytic formula") {
    val d = "/root/testdata/sf0.001"
    // decode path == formula
    for (id <- Seq(0L, 42L); twin <- Seq(false, true)) {
      val v = graft.operators.RawVideo.decodeY4m(
        ImageDedup.y4mQrPayload(id, twin))
      for (f <- Seq(0, 2, 4); y <- 0 until 8; x <- 0 until 8) {
        val base = ImageDedup.lumaPixel(id, f, x, y)
        val want = if (twin && f == 2 && x == 3 && y == 4) (base + 128) % 256
          else base
        assert((v.frames(f).luma(y * 8 + x) & 0xff) == want,
          s"id=$id twin=$twin f=$f ($x,$y)")
      }
    }
    val got = SparkEntry.queries("multimodal_video_dhash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nDocs = Engine.table(spark, d, "documents").count()
    assert(got.length == nDocs)
    got.foreach { case (a, b, m) =>
      assert(b == a + 10000000L, s"unexpected organic pair ($a,$b)")
      // frame 2 is perturbed: its dHash may or may not survive, the
      // other two sampled frames ALWAYS match
      assert(m == 2 || m == 3)
    }
    assert(got.exists(_._3 == 2), "perturbation never changed a hash?")
  }

  test("audio fingerprint dedup: decoded samples equal the formula; " +
    "every twin found at Hamming <= 2; matches brute force") {
    import graft.operators.RawAudio
    val d = "/root/testdata/sf0.001"
    for (id <- Seq(0L, 99L); twin <- Seq(false, true)) {
      val clip = RawAudio.decodeWav(ImageDedup.wavQrPayload(id, twin))
      assert(clip.samples.length == 256)
      for (t <- 0 until 256) {
        val base = ImageDedup.audioSample(id, t)
        val want = if (twin && t >= 80 && t < 88)
          ((base + 32768 + 16384) % 65536) - 32768 else base
        assert(clip.samples(t).toInt == want, s"id=$id twin=$twin t=$t")
      }
    }
    val got = SparkEntry.queries("multimodal_audio_fp")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = Engine.table(spark, d, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val fps = (ids.map(id => id -> ImageDedup.audioFingerprint(
      RawAudio.decodeWav(ImageDedup.wavQrPayload(id, false)).samples)) ++
      ids.map(id => (id + 10000000L) -> ImageDedup.audioFingerprint(
        RawAudio.decodeWav(ImageDedup.wavQrPayload(id, true)).samples)))
      .toMap
    val expect = (for {
      a <- fps.keys; b <- fps.keys if a < b
      ham = java.lang.Long.bitCount(fps(a) ^ fps(b)) if ham <= 2
    } yield (a, b, ham)).toSeq.sorted
    assert(got.toSeq.sorted == expect)
    val twins = got.filter { case (a, b, _) => b == a + 10000000L }
    assert(twins.length == ids.length && twins.forall(_._3 <= 2))
  }

  test("entry finds every planted twin at Hamming <= 2 and matches a " +
    "brute-force Hamming join at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("multimodal_dhash_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val hs = ImageDedup.hashes(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (for {
      a <- hs.keys; b <- hs.keys if a < b
      ham = java.lang.Long.bitCount(hs(a) ^ hs(b)) if ham <= 4
    } yield (a, b, ham)).toSeq.sorted
    assert(got.toSeq.sorted == expect)
    // every planted twin is found, close to its base
    val twins = got.filter { case (a, b, _) => b == a + 10000000L }
    assert(twins.length == hs.size / 2)
    assert(twins.forall(_._3 <= 2))
  }
}
