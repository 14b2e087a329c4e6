package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Baseline JPEG via the JDK's own `javax.imageio` codec (public API,
  * no native libraries — works headless). This closes the lossy-image
  * boundary the r8 verdict asked to be decided explicitly: PNG/PPM/BMP
  * decode bit-exactly and carry DuckDB oracles; JPEG's inverse-DCT
  * output is implementation-defined (two conforming decoders may
  * differ by ±1 per sample), so the JPEG path is deliberately
  * SPEC-checked — pixel dimensions exact, channel means within a lossy
  * tolerance on smooth fixtures (JpegSpec) — rather than
  * oracle-checked. WebP/MP3 stay behind [[MultimodalOps.decodeStub]]
  * (no JDK codec exists).
  *
  * The reference treats compressed imagery as opaque binary at scan
  * level; parity here is with the multimodal pipeline surface
  * (decode/feature/resize plumbing), not a reference C++ codec.
  */
object RawJpeg {

  // SOI marker + the 0xFF that opens the next segment
  def sniff(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff

  init()
  private def init(): Unit = {
    System.setProperty("java.awt.headless", "true")
    // executors decode concurrently; the on-disk ImageIO cache is both
    // slower and a temp-dir dependency
    ImageIO.setUseCache(false)
  }

  def decode(p: Array[Byte]): RawImage.Image = {
    require(sniff(p), "not a JPEG")
    val bi = ImageIO.read(new ByteArrayInputStream(p))
    require(bi != null, "undecodable JPEG stream")
    val w = bi.getWidth; val h = bi.getHeight
    val rgb = new Array[Byte](w * h * 3)
    val px = bi.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < w * h) {
      val v = px(i)
      rgb(i * 3) = ((v >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((v >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (v & 0xff).toByte
      i += 1
    }
    RawImage.Image(w, h, rgb)
  }

  def encode(img: RawImage.Image): Array[Byte] = {
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < img.width * img.height) {
      bi.setRGB(i % img.width, i / img.width,
        ((img.rgb(i * 3) & 0xff) << 16) |
          ((img.rgb(i * 3 + 1) & 0xff) << 8) |
          (img.rgb(i * 3 + 2) & 0xff))
      i += 1
    }
    val bo = new ByteArrayOutputStream()
    require(ImageIO.write(bi, "jpg", bo), "no JPEG writer available")
    bo.toByteArray
  }
}
