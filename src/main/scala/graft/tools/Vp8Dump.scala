package graft.tools

import java.nio.file.{Files, Paths}

import graft.operators.RawVp8Enc

/** Dumps RawVp8Enc-encoded lossy streams + their exact YUV planes so
  * tools/check_vp8_encode.py can decode them with the REFERENCE
  * libwebp and assert plane equality — the encoder half of the VP8
  * conformance loop (the decoder half is Vp8Spec's golden corpus).
  * All rasters are 4x4-block-constant, so the DC-only encoder is
  * exact and the dumped planes are the normative decode output.
  * Usage: Vp8Dump <outDir>
  */
object Vp8Dump {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.head)
    Files.createDirectories(out)
    val cases = Seq(
      ("v01_16x16", 16, 16, 1L), ("v02_32x16", 32, 16, 2L),
      ("v03_48x48", 48, 48, 3L), ("v04_24x8", 24, 8, 4L),
      ("v05_8x8", 8, 8, 5L), ("v06_160x96", 160, 96, 6L),
      ("v07_extremes", 32, 32, -1L))
    cases.foreach { case (name, w, h, seed) =>
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val y = new Array[Int](w * h)
      val u = new Array[Int](cw * ch)
      val v = new Array[Int](cw * ch)
      if (seed >= 0) {
        for (yy <- 0 until h; xx <- 0 until w)
          y(yy * w + xx) = ((seed * 31 + (xx / 4) * 17 + (yy / 4) * 29) % 251).toInt
        for (yy <- 0 until ch; xx <- 0 until cw) {
          u(yy * cw + xx) = ((seed * 13 + (xx / 4) * 7 + (yy / 4) * 23) % 251).toInt
          v(yy * cw + xx) = ((seed * 11 + (xx / 4) * 3 + (yy / 4) * 19) % 251).toInt
        }
      } else {
        // max-magnitude checkerboard: category-6 tokens + carries
        for (yy <- 0 until h; xx <- 0 until w)
          y(yy * w + xx) = if ((xx / 4 + yy / 4) % 2 == 0) 0 else 250
        for (yy <- 0 until ch; xx <- 0 until cw) {
          u(yy * cw + xx) = if ((xx / 4) % 2 == 0) 5 else 245
          v(yy * cw + xx) = if ((yy / 4) % 2 == 0) 250 else 2
        }
      }
      Files.write(out.resolve(name + ".webp"), RawVp8Enc.encodeWebp(w, h, y, u, v))
      val yuv = new Array[Byte](w * h + 2 * cw * ch)
      var i = 0
      while (i < w * h) { yuv(i) = y(i).toByte; i += 1 }
      i = 0
      while (i < cw * ch) {
        yuv(w * h + i) = u(i).toByte
        yuv(w * h + cw * ch + i) = v(i).toByte
        i += 1
      }
      Files.write(out.resolve(name + ".yuv"), yuv)
      println(s"$name ${w}x$h")
    }
  }
}
