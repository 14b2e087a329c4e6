package graft

import java.nio.file.{Files, Paths}

import graft.operators.RawGif
import org.scalatest.funsuite.AnyFunSuite

/** GIF conformance against the reference giflib.
  *
  * Every fixture under src/test/resources/gif/ was encoded by the
  * SYSTEM giflib (tools/gen_gif_golden.py); the .idx golden carries
  * the logical index rasters as constructed. GIF is lossless indexed
  * color, so the engine decoder must reproduce every raster
  * INDEX-EXACT — an independent-implementation conformance check
  * (giflib's LZW encoder produced the streams, not the code under
  * test). The encode direction (giflib decodes RawGif.encode streams
  * back to the exact rasters) is tools/check_gif_encode.py.
  */
class GifSpec extends AnyFunSuite {

  private val dir = Paths.get("src/test/resources/gif")

  private def gif(name: String) = Files.readAllBytes(dir.resolve(s"$name.gif"))
  private def idx(name: String) = Files.readAllBytes(dir.resolve(s"$name.idx"))

  private def checkFrames(name: String, expectFrames: Int): RawGif.Gif = {
    val g = RawGif.decode(gif(name))
    assert(g.frames.length == expectFrames, s"$name frame count")
    val golden = idx(name)
    var off = 0
    for ((f, i) <- g.frames.zipWithIndex) {
      val want = java.util.Arrays.copyOfRange(golden, off, off + f.width * f.height)
      off += f.width * f.height
      assert(f.indices.sameElements(want), s"$name frame $i raster mismatch")
    }
    assert(off == golden.length, s"$name golden fully consumed")
    // effective palettes, byte-exact against the .pal golden
    val pals = Files.readAllBytes(dir.resolve(s"$name.pal"))
    var po = 0
    for ((f, i) <- g.frames.zipWithIndex) {
      for (c <- f.palette) {
        assert((pals(po) & 0xff) == ((c >> 16) & 0xff) &&
          (pals(po + 1) & 0xff) == ((c >> 8) & 0xff) &&
          (pals(po + 2) & 0xff) == (c & 0xff), s"$name frame $i palette")
        po += 3
      }
    }
    assert(po == pals.length, s"$name palette golden fully consumed")
    g
  }

  test("2-color (minimum code size) raster decodes index-exact") {
    val g = checkFrames("pal2_bw", 1)
    assert(g.width == 33 && g.height == 21)
    assert(g.frames.head.palette.length == 2)
  }

  test("16-color noise decodes index-exact") { checkFrames("pal16_noise", 1) }

  test("256-color noise crosses all LZW width boundaries + table-full clear") {
    val g = checkFrames("pal256_noise", 1)
    assert(g.frames.head.palette.length == 256)
  }

  test("long smooth runs (deep LZW chains) decode index-exact") {
    checkFrames("pal256_smooth", 1)
  }

  test("interlaced raster is de-interlaced to logical row order") {
    val g = checkFrames("interlaced", 1)
    assert(g.width == 64 && g.height == 64)
  }

  test("multi-frame animation with graphic-control extensions") {
    val g = checkFrames("frames3", 3)
    val Seq(f0, f1, f2) = g.frames
    assert(f0.delayCs == 10 && f0.transIndex == -1 && f0.disposal == 1)
    assert(f1.delayCs == 20 && f1.transIndex == 5 && f1.disposal == 2)
    assert(f1.left == 4 && f1.top == 6 && f1.width == 20 && f1.height == 16)
    assert(f2.delayCs == 30 && f2.transIndex == 0 && f2.disposal == 3)
  }

  test("local color tables without a global one") {
    val g = checkFrames("localpal", 2)
    assert(g.globalPalette.isEmpty)
    assert(g.frames(0).palette.length == 8)
    assert(g.frames(1).palette.length == 4)
  }

  test("degenerate sizes decode") {
    checkFrames("tiny1x1", 1)
    checkFrames("tiny3x2", 1)
  }

  test("encode -> decode roundtrip is lossless (own streams)") {
    for (seed <- 1 to 4; n <- Seq(2, 4, 16, 256)) {
      val w = 37; val h = 23
      val rng = new java.util.Random(seed * 1000 + n)
      val pal = Array.fill(n)(rng.nextInt(1 << 24))
      val indices = Array.fill(w * h)((rng.nextInt(n)).toByte)
      val data = RawGif.encode(w, h, pal, indices)
      assert(RawGif.sniff(data))
      val g = RawGif.decode(data)
      assert(g.width == w && g.height == h)
      assert(g.frames.head.indices.sameElements(indices), s"n=$n seed=$seed")
      assert(g.frames.head.palette.sameElements(pal))
    }
  }

  test("encode roundtrip crosses the 4096-entry table reset") {
    val w = 128; val h = 128
    val rng = new java.util.Random(77)
    val pal = Array.tabulate(256)(i => i * 0x010101)
    val indices = Array.fill(w * h)((rng.nextInt(256)).toByte)
    val g = RawGif.decode(RawGif.encode(w, h, pal, indices))
    assert(g.frames.head.indices.sameElements(indices))
  }

  test("firstFrameRgb composites transparency over the background") {
    val g = RawGif.firstFrameRgb(gif("pal2_bw"))
    assert(g.width == 33 && g.height == 21 && g.rgb.length == 33 * 21 * 3)
  }
}
