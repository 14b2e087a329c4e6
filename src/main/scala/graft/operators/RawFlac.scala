package graft.operators

/** Pure-JVM FLAC codec, written from the public specification
  * (RFC 9639: "Free Lossless Audio Codec"). FLAC is the audio twin of
  * the [[RawWebp]] move: a real COMPRESSED codec whose lossless output
  * is DuckDB-mirrorable, so the decode pipeline is oracle-checked end
  * to end (multimodal_decode_flac) rather than spec-checked only.
  *
  * Decoder scope: the full subframe set — CONSTANT, VERBATIM, FIXED
  * orders 0-4 and LPC up to order 32 (quantized coefficients +
  * arithmetic shift), rice residuals in both 4- and 5-bit parameter
  * methods with partition orders and escape partitions, wasted bits,
  * all four channel assignments (independent, left/side, right/side,
  * mid/side with the odd-bit reconstruction), sample sizes 8-32 bits,
  * UTF-8-coded frame/sample numbers, and CRC-8 (poly 0x07) header +
  * CRC-16 (poly 0x8005) frame verification. Unknown metadata blocks
  * are skipped like ancillary PNG chunks.
  *
  * Encoder scope (round-trip + driver payloads): STREAMINFO + fixed-
  * blocking frames; per subframe the best of CONSTANT / FIXED 0-4
  * under rice cost with VERBATIM as the bound; stereo frames cycle
  * the four channel assignments and frames alternate rice partition
  * orders 0/1, so an encode->decode round-trip exercises every
  * decoder path the encoder can reach (the rest — LPC, escapes,
  * wasted bits — are pinned by hand-built spec streams in FlacSpec).
  */
object RawFlac {

  /** Decoded stream: interleaved samples, one Int per sample. */
  final case class Audio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Int])

  def sniff(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' &&
      p(3) == 'C'

  // ------------------------------------------------------------- CRCs

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header checksum. */
  def crc8(p: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = off
    while (i < off + len) {
      crc ^= p(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — frame checksum. */
  def crc16(p: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = off
    while (i < off + len) {
      crc ^= (p(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------- bit reader

  /** MSB-first bit reader (FLAC is big-endian bit-packed — the
    * opposite order of [[RawWebp]]'s VP8L streams).
    */
  private final class BitReader(val data: Array[Byte], var pos: Int) {
    var bit = 0
    def readBit(): Int = {
      require(pos < data.length, "FLAC: read past end")
      val v = (data(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 0) 0 else (v << (32 - n)) >> (32 - n)
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ------------------------------------------------------------ decode

  private val SampleRateTable = Array(0, 88200, 176400, 192000, 8000,
    16000, 22050, 24000, 32000, 44100, 48000, 96000)

  def decode(p: Array[Byte]): Audio = {
    require(sniff(p), "not a FLAC stream")
    var off = 4
    var rate = 0; var channels = 0; var bps = 0
    var totalSamples = 0L
    var last = false
    var sawStreamInfo = false
    while (!last) {
      require(off + 4 <= p.length, "FLAC: truncated metadata")
      last = (p(off) & 0x80) != 0
      val typ = p(off) & 0x7f
      val len = ((p(off + 1) & 0xff) << 16) | ((p(off + 2) & 0xff) << 8) |
        (p(off + 3) & 0xff)
      require(off + 4 + len <= p.length, "FLAC: metadata overruns stream")
      if (typ == 0) { // STREAMINFO
        val b = off + 4
        rate = ((p(b + 10) & 0xff) << 12) | ((p(b + 11) & 0xff) << 4) |
          ((p(b + 12) & 0xff) >> 4)
        channels = ((p(b + 12) >> 1) & 0x7) + 1
        bps = (((p(b + 12) & 0x1) << 4) | ((p(b + 13) & 0xff) >> 4)) + 1
        totalSamples = ((p(b + 13) & 0xfL) << 32) |
          ((p(b + 14) & 0xffL) << 24) | ((p(b + 15) & 0xffL) << 16) |
          ((p(b + 16) & 0xffL) << 8) | (p(b + 17) & 0xffL)
        sawStreamInfo = true
      } // other metadata blocks (padding, vorbis comment, ...) skipped
      off += 4 + len
    }
    require(sawStreamInfo && rate > 0, "FLAC: missing STREAMINFO")
    val samples = scala.collection.mutable.ArrayBuilder.make[Int]
    var decoded = 0L
    val br = new BitReader(p, off)
    while (br.pos < p.length &&
        (totalSamples == 0 || decoded < totalSamples)) {
      val frame = decodeFrame(br, rate, channels, bps)
      samples ++= frame
      decoded += frame.length / channels
    }
    require(totalSamples == 0 || decoded == totalSamples,
      s"FLAC: decoded $decoded of $totalSamples samples")
    Audio(rate, channels, bps, samples.result())
  }

  /** [[Audio]] as a PCM16 [[RawAudio.Clip]] (bps must be 16). */
  def toClip(a: Audio): RawAudio.Clip = {
    require(a.bitsPerSample == 16, s"bps ${a.bitsPerSample}")
    RawAudio.Clip(a.sampleRate, a.channels,
      a.samples.map(_.toShort))
  }

  private def decodeFrame(br: BitReader, siRate: Int, siChannels: Int,
      siBps: Int): Array[Int] = {
    val frameStart = br.pos
    require(br.bit == 0, "FLAC: frame not byte-aligned")
    require(br.readBits(14) == 0x3ffe, "FLAC: bad sync code")
    require(br.readBit() == 0, "FLAC: reserved bit set")
    br.readBit() // blocking strategy (number semantics only)
    val bsCode = br.readBits(4)
    val srCode = br.readBits(4)
    val chCode = br.readBits(4)
    val ssCode = br.readBits(3)
    require(br.readBit() == 0, "FLAC: reserved bit set")
    // UTF-8-coded frame/sample number (value unused; length matters)
    val first = br.readBits(8)
    var follow = 0
    var mask = 0x80
    while ((first & mask) != 0) { follow += 1; mask >>= 1 }
    if (follow > 0) {
      require(follow >= 2 && follow <= 7, "FLAC: bad coded number")
      var i = 0
      while (i < follow - 1) {
        require((br.readBits(8) & 0xc0) == 0x80, "FLAC: bad coded number")
        i += 1
      }
    }
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("FLAC: reserved bs code")
      case 1 => 192
      case 6 => br.readBits(8) + 1
      case 7 => br.readBits(16) + 1
      case n if n <= 5 => 576 << (n - 2)
      case n => 256 << (n - 8)
    }
    srCode match {
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => throw new IllegalArgumentException("FLAC: bad sr code")
      case _ => ()
    }
    val channels = if (chCode < 8) chCode + 1 else 2
    require(chCode <= 10, s"FLAC: reserved channel assignment $chCode")
    require(channels == siChannels, "FLAC: channel count mismatch")
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw new IllegalArgumentException("FLAC: reserved bps code")
    }
    br.alignByte()
    val headerLen = br.pos - frameStart
    val storedCrc8 = br.readBits(8)
    require(storedCrc8 == crc8(br.data, frameStart, headerLen),
      "FLAC: frame header CRC-8 mismatch")
    // subframes
    val chans = Array.tabulate(channels) { ch =>
      val sideBit = chCode match {
        case 8 => if (ch == 1) 1 else 0  // left/side
        case 9 => if (ch == 0) 1 else 0  // right(stored side first)/side
        case 10 => if (ch == 1) 1 else 0 // mid/side
        case _ => 0
      }
      decodeSubframe(br, blockSize, bps + sideBit)
    }
    br.alignByte()
    val bodyLen = br.pos - frameStart
    val storedCrc16 = br.readBits(16)
    require(storedCrc16 == crc16(br.data, frameStart, bodyLen),
      "FLAC: frame CRC-16 mismatch")
    // stereo decorrelation
    chCode match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) {
          chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
        }
      case 9 => // right/side: stored (side, right); left = right + side
        var i = 0
        while (i < blockSize) {
          val side = chans(0)(i)
          chans(0)(i) = chans(1)(i) + side
          i += 1
        }
      case 10 => // mid/side with the dropped low bit carried by side
        var i = 0
        while (i < blockSize) {
          val mid2 = (chans(0)(i) << 1) | (chans(1)(i) & 1)
          val side = chans(1)(i)
          chans(0)(i) = (mid2 + side) >> 1
          chans(1)(i) = (mid2 - side) >> 1
          i += 1
        }
      case _ => ()
    }
    val out = new Array[Int](blockSize * channels)
    var i = 0
    while (i < blockSize) {
      var c = 0
      while (c < channels) {
        out(i * channels + c) = chans(c)(i)
        c += 1
      }
      i += 1
    }
    out
  }

  private def decodeSubframe(br: BitReader, blockSize: Int,
      bps: Int): Array[Int] = {
    require(br.readBit() == 0, "FLAC: subframe padding bit set")
    val typ = br.readBits(6)
    val wasted = if (br.readBit() == 1) br.readUnary() + 1 else 0
    val eff = bps - wasted
    val s = new Array[Int](blockSize)
    if (typ == 0) { // CONSTANT
      val v = br.readSigned(eff)
      java.util.Arrays.fill(s, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { s(i) = br.readSigned(eff); i += 1 }
    } else if (typ >= 8 && typ <= 12) { // FIXED, order = typ - 8
      val order = typ - 8
      var i = 0
      while (i < order) { s(i) = br.readSigned(eff); i += 1 }
      decodeResiduals(br, s, order, blockSize)
      restoreFixed(s, order, blockSize)
    } else if (typ >= 32) { // LPC, order = (typ & 31) + 1
      val order = (typ & 31) + 1
      var i = 0
      while (i < order) { s(i) = br.readSigned(eff); i += 1 }
      val precision = br.readBits(4) + 1
      require(precision <= 15, "FLAC: invalid qlp precision")
      val shift = br.readSigned(5)
      require(shift >= 0, "FLAC: negative qlp shift")
      val coefs = Array.fill(order)(br.readSigned(precision))
      decodeResiduals(br, s, order, blockSize)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
        s(i) += (acc >> shift).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(s"FLAC: reserved subframe $typ")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Rice-coded residual section (both parameter widths, partition
    * orders, escape partitions), decoded into s(order..blockSize).
    */
  private def decodeResiduals(br: BitReader, s: Array[Int], order: Int,
      blockSize: Int): Unit = {
    val method = br.readBits(2)
    require(method <= 1, "FLAC: reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = br.readBits(4)
    val partitions = 1 << po
    require(blockSize % partitions == 0, "FLAC: bad partition order")
    var idx = order
    var part = 0
    while (part < partitions) {
      val count = (blockSize >> po) - (if (part == 0) order else 0)
      val param = br.readBits(paramBits)
      if (param == escape) {
        val raw = br.readBits(5)
        var i = 0
        while (i < count) { s(idx) = br.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary()
          val u = (q << param) | br.readBits(param)
          s(idx) = (u >>> 1) ^ -(u & 1) // zigzag
          idx += 1
          i += 1
        }
      }
      part += 1
    }
  }

  /** Fixed polynomial predictors, RFC 9639 §9.2.2. */
  private def restoreFixed(s: Array[Int], order: Int,
      blockSize: Int): Unit = {
    var i = order
    while (i < blockSize) {
      order match {
        case 0 => ()
        case 1 => s(i) += s(i - 1)
        case 2 => s(i) += 2 * s(i - 1) - s(i - 2)
        case 3 => s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case _ => s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) -
          s(i - 4)
      }
      i += 1
    }
  }

  // ------------------------------------------------------------ encode

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nb = 0
    def writeBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1)
      nb += 1
      if (nb == 8) { buf.write(acc); acc = 0; nb = 0 }
    }
    def writeBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit((v >> i) & 1); i -= 1 }
    }
    def alignByte(): Unit = while (nb != 0) writeBit(0)
    def bytes: Array[Byte] = { alignByte(); buf.toByteArray }
  }

  private def riceCost(res: Array[Int], from: Int, until: Int,
      param: Int): Long = {
    var cost = 0L
    var i = from
    while (i < until) {
      val u = (res(i) << 1) ^ (res(i) >> 31)
      cost += (u >>> param) + 1 + param
      i += 1
    }
    cost
  }

  private def bestRice(res: Array[Int], from: Int, until: Int,
      maxParam: Int): (Int, Long) = {
    var best = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p <= maxParam) {
      val c = riceCost(res, from, until, p)
      if (c < bestCost) { bestCost = c; best = p }
      p += 1
    }
    (best, bestCost)
  }

  /** Encode PCM16 as FLAC. Stereo frames cycle the four channel
    * assignments and frames alternate partition orders 0/1 (see class
    * doc — round-trip path coverage, and mid/side genuinely shrinks
    * correlated stereo).
    */
  def encode(clip: RawAudio.Clip, blockSize: Int = 4096): Array[Byte] = {
    val channels = clip.channels
    require(channels >= 1 && channels <= 8, "channels")
    require(blockSize >= 16 && blockSize <= 65535, "block size")
    val nTotal = clip.samples.length / channels
    val bps = 16
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.writeBits(1, 1); si.writeBits(0, 7) // last, type 0
    si.writeBits(34, 24)
    si.writeBits(blockSize, 16); si.writeBits(blockSize, 16)
    si.writeBits(0, 24); si.writeBits(0, 24) // frame sizes unknown
    si.writeBits(clip.sampleRate, 20)
    si.writeBits(channels - 1, 3)
    si.writeBits(bps - 1, 5)
    si.writeBits(0, 4)
    si.writeBits(((nTotal >> 16) & 0xffff).toInt, 16)
    si.writeBits((nTotal & 0xffff).toInt, 16)
    (0 until 16).foreach(_ => si.writeBits(0, 8)) // MD5 unknown
    out.write(si.bytes)
    var frameIdx = 0
    var start = 0
    while (start < nTotal) {
      val bs = math.min(blockSize, nTotal - start)
      val chan = Array.tabulate(channels) { c =>
        Array.tabulate(bs)(i =>
          clip.samples((start + i) * channels + c).toInt)
      }
      // stereo decorrelation: cycle all four assignments for path
      // coverage (independent, left/side, right/side, mid/side)
      val chCode =
        if (channels == 2) (frameIdx % 4) match {
          case 0 => 1; case 1 => 8; case 2 => 9; case _ => 10
        } else channels - 1
      val (enc0, enc1, bits0, bits1) = if (channels == 2 && chCode >= 8) {
        val left = chan(0); val right = chan(1)
        val side = Array.tabulate(bs)(i => left(i) - right(i))
        chCode match {
          case 8 => (left, side, bps, bps + 1)
          case 9 => (side, right, bps + 1, bps)
          case _ =>
            val mid = Array.tabulate(bs)(i => (left(i) + right(i)) >> 1)
            (mid, side, bps, bps + 1)
        }
      } else (chan(0), if (channels > 1) chan(1) else null, bps, bps)
      val bw = new BitWriter
      bw.writeBits(0x3ffe, 14)
      bw.writeBit(0)
      bw.writeBit(0) // fixed blocking strategy
      bw.writeBits(7, 4) // block size: 16-bit value follows
      bw.writeBits(0, 4)  // sample rate: from STREAMINFO
      bw.writeBits(chCode, 4)
      bw.writeBits(4, 3) // bps 16
      bw.writeBit(0)
      writeUtf8Number(bw, frameIdx)
      bw.writeBits(bs - 1, 16)
      val headerBytes = bw.bytes // aligned: header is whole bytes
      val bw2 = new BitWriter
      headerBytes.foreach(b => bw2.writeBits(b & 0xff, 8))
      bw2.writeBits(crc8(headerBytes, 0, headerBytes.length), 8)
      val po = if (bs == blockSize && (bs & 1) == 0 && frameIdx % 2 == 1) 1
        else 0
      if (channels == 2 && chCode >= 8) {
        encodeSubframe(bw2, enc0, bits0, po)
        encodeSubframe(bw2, enc1, bits1, po)
      } else {
        var c = 0
        while (c < channels) {
          encodeSubframe(bw2, chan(c), bps, po)
          c += 1
        }
      }
      bw2.alignByte()
      val body = bw2.bytes
      out.write(body)
      val crc = crc16(body, 0, body.length)
      out.write((crc >> 8) & 0xff)
      out.write(crc & 0xff)
      start += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  private def writeUtf8Number(bw: BitWriter, v: Int): Unit = {
    if (v < 0x80) bw.writeBits(v, 8)
    else if (v < 0x800) {
      bw.writeBits(0xc0 | (v >> 6), 8)
      bw.writeBits(0x80 | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      bw.writeBits(0xe0 | (v >> 12), 8)
      bw.writeBits(0x80 | ((v >> 6) & 0x3f), 8)
      bw.writeBits(0x80 | (v & 0x3f), 8)
    } else {
      bw.writeBits(0xf0 | (v >> 18), 8)
      bw.writeBits(0x80 | ((v >> 12) & 0x3f), 8)
      bw.writeBits(0x80 | ((v >> 6) & 0x3f), 8)
      bw.writeBits(0x80 | (v & 0x3f), 8)
    }
  }

  private def encodeSubframe(bw: BitWriter, s: Array[Int], bps: Int,
      po: Int): Unit = {
    val n = s.length
    // constant?
    if (s.forall(_ == s(0))) {
      bw.writeBit(0); bw.writeBits(0, 6); bw.writeBit(0)
      bw.writeBits(s(0), bps) // low bps bits of the two's complement
      return
    }
    // best fixed order by rice cost (order 0 included)
    val partitions = 1 << po
    var bestOrder = 0
    var bestCost = Long.MaxValue
    var bestRes: Array[Int] = null
    var order = 0
    while (order <= 4 && order < n) {
      val res = fixedResiduals(s, order)
      if (res != null) {
        var cost = order.toLong * bps
        var part = 0
        var idx = order
        var ok = n % partitions == 0 && (n >> po) > order
        while (ok && part < partitions) {
          val count = (n >> po) - (if (part == 0) order else 0)
          val (_, c) = bestRice(res, idx, idx + count, 14)
          cost += c + 4
          idx += count
          part += 1
        }
        if (ok && cost < bestCost) {
          bestCost = cost; bestOrder = order; bestRes = res
        }
      }
      order += 1
    }
    if (bestRes == null || bestCost >= n.toLong * bps) { // verbatim
      bw.writeBit(0); bw.writeBits(1, 6); bw.writeBit(0)
      var i = 0
      while (i < n) { bw.writeBits(s(i), bps); i += 1 }
      return
    }
    bw.writeBit(0)
    bw.writeBits(8 + bestOrder, 6)
    bw.writeBit(0) // no wasted bits
    var i = 0
    while (i < bestOrder) { bw.writeBits(s(i), bps); i += 1 }
    bw.writeBits(0, 2) // rice method 0 (4-bit params)
    bw.writeBits(po, 4)
    var part = 0
    var idx = bestOrder
    while (part < partitions) {
      val count = (n >> po) - (if (part == 0) bestOrder else 0)
      val (param, _) = bestRice(bestRes, idx, idx + count, 14)
      bw.writeBits(param, 4)
      var k = 0
      while (k < count) {
        val u = (bestRes(idx) << 1) ^ (bestRes(idx) >> 31)
        var q = u >>> param
        while (q > 0) { bw.writeBit(0); q -= 1 }
        bw.writeBit(1)
        bw.writeBits(u & ((1 << param) - 1), param)
        idx += 1
        k += 1
      }
      part += 1
    }
  }

  /** Residuals for fixed order n, or null when they overflow Int
    * (the 17+-bit side-channel case is fine; this guards pathology).
    */
  private def fixedResiduals(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length
    val res = new Array[Int](n)
    var i = 0
    while (i < order) { res(i) = s(i); i += 1 }
    while (i < n) {
      val p = order match {
        case 0 => 0L
        case 1 => s(i - 1).toLong
        case 2 => 2L * s(i - 1) - s(i - 2)
        case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
        case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) -
          s(i - 4)
      }
      val r = s(i) - p
      if (r > Int.MaxValue || r < Int.MinValue) return null
      res(i) = r.toInt
      i += 1
    }
    res
  }
}
