package graft.tools

import java.nio.file.{Files, Paths}

import graft.operators.{RawImage, RawWebp}

/** Dumps RawWebp-encoded streams + their raw RGB rasters so
  * tools/check_webp_encode.py can decode them with the REFERENCE
  * libwebp and assert pixel equality — the encoder half of the WebP
  * conformance loop (the decoder half is WebpSpec's golden corpus).
  * Usage: WebpDump <outDir>
  */
object WebpDump {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.head)
    Files.createDirectories(out)
    val cases = Seq(
      ("e01_1x1", 1, 1), ("e02_5x5", 5, 5), ("e03_8x8", 8, 8),
      ("e04_64x2", 64, 2), ("e05_31x17", 31, 17), ("e06_300x200", 300, 200),
      ("e07_flat", 100, 50), ("e08_runs", 90, 30))
    cases.foreach { case (name, w, h) =>
      val rgb = new Array[Byte](w * h * 3)
      name match {
        case "e07_flat" => java.util.Arrays.fill(rgb, 42.toByte)
        case "e08_runs" =>
          var i = 0
          while (i < w * h) {
            val v = if ((i / 30) % 2 == 0) 17 else 204
            rgb(i * 3) = v.toByte; rgb(i * 3 + 1) = (v + 17).toByte
            rgb(i * 3 + 2) = (v + 34).toByte
            i += 1
          }
        case _ =>
          val rnd = new java.util.Random(name.hashCode)
          rnd.nextBytes(rgb)
          // flat spans so the LZ77 run tokenizer fires
          var i = 0
          while (i + 8 < w * h) {
            var k = 1
            while (k <= 3 && i + k < w * h) {
              System.arraycopy(rgb, i * 3, rgb, (i + k) * 3, 3)
              k += 1
            }
            i += 16
          }
      }
      Files.write(out.resolve(name + ".webp"),
        RawWebp.encode(RawImage.Image(w, h, rgb)))
      Files.write(out.resolve(name + ".rgb"), rgb)
      println(s"$name ${w}x$h")
    }
  }
}
