package graft.tools

import java.nio.file.{Files, Paths}

import graft.operators.RawGif

/** Dumps RawGif-encoded streams + their index rasters and palettes so
  * tools/check_gif_encode.py can decode them with the REFERENCE giflib
  * and assert raster equality — the encoder half of the GIF
  * conformance loop (the decoder half is GifSpec's golden corpus).
  * Usage: GifDump <outDir>
  */
object GifDump {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.head)
    Files.createDirectories(out)
    val cases = Seq(
      ("g01_pal2", 33, 21, 2, 1L), ("g02_pal4", 17, 9, 4, 2L),
      ("g03_pal16", 40, 30, 16, 3L), ("g04_pal256", 64, 48, 256, 4L),
      ("g05_bigfill", 128, 128, 256, 5L), // crosses the 4096-entry reset
      ("g06_runs", 90, 60, 16, 6L), ("g07_1x1", 1, 1, 2, 7L))
    cases.foreach { case (name, w, h, n, seed) =>
      val rng = new java.util.Random(seed)
      val pal = Array.fill(n)(rng.nextInt(1 << 24))
      val indices =
        if (name == "g06_runs")
          Array.tabulate(w * h)(i => ((i / 23) % n).toByte) // long runs
        else Array.fill(w * h)(rng.nextInt(n).toByte)
      Files.write(out.resolve(name + ".gif"), RawGif.encode(w, h, pal, indices))
      Files.write(out.resolve(name + ".idx"), indices)
      val palBytes = new Array[Byte](n * 3)
      for (i <- 0 until n) {
        palBytes(i * 3) = ((pal(i) >> 16) & 0xff).toByte
        palBytes(i * 3 + 1) = ((pal(i) >> 8) & 0xff).toByte
        palBytes(i * 3 + 2) = (pal(i) & 0xff).toByte
      }
      Files.write(out.resolve(name + ".pal"), palBytes)
      println(s"$name ${w}x$h pal$n")
    }
  }
}
