package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec: PNG is public-knowledge decodable with JDK-only
  * pieces — the container format is length-typed chunks, the pixel
  * stream is zlib (java.util.zip.Inflater) over five per-scanline
  * byte filters (None/Sub/Up/Average/Paeth, PNG spec §9). Baseline
  * JPEG decodes through [[RawJpeg]] (JDK ImageIO, spec-checked only);
  * lossless WebP through [[RawWebp]]; only lossy VP8 stays behind
  * [[MultimodalOps.decodeStub]].
  *
  * Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA — alpha
  * dropped on decode to the engine's RGB raster), non-interlaced.
  * Chunk CRCs are verified. The encoder cycles the filter type by row
  * (y % 5) so a round-trip exercises every filter reconstruction path.
  * Lossless WebP decodes through [[RawWebp]].
  */
object RawPng {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
    0x1a, 0x0a)

  def sniff(p: Array[Byte]): Boolean =
    p.length >= 8 && (0 until 8).forall(i => p(i) == SIG(i))

  private def be32(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  /** Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    * the linear estimate a+b-c, ties resolved left, up, up-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def decode(p: Array[Byte]): RawImage.Image = {
    require(sniff(p), "not a PNG")
    var i = 8
    var w = 0; var h = 0; var colorType = -1; var bpp = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && i + 8 <= p.length) {
      val len = be32(p, i)
      // validate the length field BEFORE touching chunk bytes: a corrupt
      // length must fail with a clean require, not a raw
      // ArrayIndexOutOfBoundsException from crc.update/System.arraycopy
      require(len >= 0 && i + 12 + len <= p.length,
        s"PNG chunk at offset $i: bad length $len for ${p.length}-byte payload")
      val typ = new String(p, i + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(p, i + 4, 4 + len)
      require(crc.getValue.toInt == be32(p, i + 8 + len),
        s"PNG chunk CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          w = be32(p, i + 8); h = be32(p, i + 12)
          val depth = p(i + 16) & 0xff
          colorType = p(i + 17) & 0xff
          require(depth == 8, s"unsupported PNG bit depth $depth")
          require(colorType == 0 || colorType == 2 || colorType == 6,
            s"unsupported PNG color type $colorType")
          require((p(i + 20) & 0xff) == 0, "interlaced PNG unsupported")
          bpp = colorType match {
            case 0 => 1; case 2 => 3; case 6 => 4
          }
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    require(w > 0 && h > 0 && bpp > 0, "missing IHDR")

    // one zlib stream across all IDAT chunks
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      // a stalled inflater (n == 0, not finished) must FAIL, not spin:
      // needsDictionary (FDICT streams) and needsInput (truncation) are
      // the two legal stall states, and anything else is a broken
      // stream — an executor-task infinite loop is unrescuable by the
      // callers' catch(Exception)
      require(!inf.needsDictionary, "PNG zlib stream requires a preset " +
        "dictionary (FDICT) — unsupported")
      require(n > 0 || inf.finished(),
        if (inf.needsInput) "truncated PNG pixel stream"
        else "stalled PNG zlib stream")
      off += n
    }
    inf.end()
    require(off == raw.length, s"PNG pixel stream: got $off of ${raw.length}")

    // reconstruct filters in place, then expand to the engine's RGB raster
    val cur = new Array[Byte](stride)
    val prev = new Array[Byte](stride)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      System.arraycopy(raw, y * (stride + 1) + 1, cur, 0, stride)
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val b = if (y > 0) prev(x) & 0xff else 0
        val c = if (x >= bpp && y > 0) prev(x - bpp) & 0xff else 0
        val rec = filter match {
          case 0 => cur(x) & 0xff
          case 1 => (cur(x) & 0xff) + a
          case 2 => (cur(x) & 0xff) + b
          case 3 => (cur(x) & 0xff) + ((a + b) >> 1)
          case 4 => (cur(x) & 0xff) + paeth(a, b, c)
          case f => throw new IllegalArgumentException(s"bad PNG filter $f")
        }
        cur(x) = (rec & 0xff).toByte
        x += 1
      }
      var px = 0
      while (px < w) {
        val d = (y * w + px) * 3
        colorType match {
          case 0 =>
            val g = cur(px)
            rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          case 2 =>
            rgb(d) = cur(px * 3); rgb(d + 1) = cur(px * 3 + 1)
            rgb(d + 2) = cur(px * 3 + 2)
          case 6 =>
            rgb(d) = cur(px * 4); rgb(d + 1) = cur(px * 4 + 1)
            rgb(d + 2) = cur(px * 4 + 2) // alpha dropped
        }
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    RawImage.Image(w, h, rgb)
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def be(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be(data.length))
    val t = typ.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(be(crc.getValue.toInt))
  }

  /** Encode an RGB raster as color-type-2 PNG. The filter type cycles
    * y % 5, so every decoder filter path is exercised by any image of
    * 5+ rows; filtered bytes are the spec's forward differences, making
    * decode(encode(img)) exact.
    */
  def encode(img: RawImage.Image): Array[Byte] = {
    val w = img.width; val h = img.height; val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val filter = y % 5
      raw(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val v = img.rgb(y * stride + x) & 0xff
        val a = if (x >= 3) img.rgb(y * stride + x - 3) & 0xff else 0
        val b = if (y > 0) img.rgb((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) img.rgb((y - 1) * stride + x - 3) & 0xff
          else 0
        val f = filter match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) {
      val n = def_.deflate(buf)
      zout.write(buf, 0, n)
    }
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(SIG)
    val ihdr = new Array[Byte](13)
    def putBe(arr: Array[Byte], off: Int, v: Int): Unit = {
      arr(off) = (v >>> 24).toByte; arr(off + 1) = (v >>> 16).toByte
      arr(off + 2) = (v >>> 8).toByte; arr(off + 3) = v.toByte
    }
    putBe(ihdr, 0, w); putBe(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    // compression 0, filter 0, interlace 0 already zeroed
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
