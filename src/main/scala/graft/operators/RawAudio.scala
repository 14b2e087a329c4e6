package graft.operators

/** Pure-JVM audio codec for WAV / PCM16: RIFF is a plain byte layout
  * (no compression), so the multimodal pipeline decodes it for real —
  * the audio twin of [[RawImage]]. Compressed lossless audio decodes
  * for real too ([[RawFlac]]), as do the non-transform lossy codings
  * (G.711 companding via [[RawG711]] — WAV tags 6/7 below — and IMA
  * ADPCM via [[RawAdpcm]]); transform audio (MP3/AAC/Opus) stays
  * behind the stub boundary.
  */
object RawAudio {

  /** Decoded clip: interleaved 16-bit samples. */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Short])

  def sniff(p: Array[Byte]): String =
    if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
      p(11) == 'E') "audio/wav"
    else "unknown"

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  /** RIFF/WAVE with fmt and data chunks in any order. Format tags:
    * 1 = PCM16, 6 = G.711 A-law, 7 = G.711 mu-law (8-bit companded,
    * expanded to PCM16 via [[RawG711]] — a REAL lossy decode path).
    * Handles data-before-fmt by deferring the expansion.
    */
  def decodeWav(p: Array[Byte]): Clip = {
    require(sniff(p) == "audio/wav", "not a WAV")
    var off = 12
    var rate = 0; var channels = 0; var fmtTag = -1
    var dataOff = -1; var dataSize = -1
    while (off + 8 <= p.length) {
      val id = new String(p, off, 4, "US-ASCII")
      val size = le32(p, off + 4)
      id match {
        case "fmt " =>
          fmtTag = le16(p, off + 8)
          require(fmtTag == 1 || fmtTag == 6 || fmtTag == 7,
            s"unsupported WAV format tag $fmtTag (PCM/A-law/mu-law only)")
          channels = le16(p, off + 10)
          rate = le32(p, off + 12)
          val bps = le16(p, off + 22)
          require(bps == (if (fmtTag == 1) 16 else 8),
            s"format tag $fmtTag requires ${if (fmtTag == 1) 16 else 8}-bit")
        case "data" =>
          dataOff = off + 8; dataSize = size
        case _ => () // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + size + (size & 1) // chunks pad to even lengths
    }
    require(dataOff >= 0 && rate > 0, "missing fmt/data chunk")
    val samples = fmtTag match {
      case 1 =>
        val n = dataSize / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = le16(p, dataOff + i * 2).toShort; i += 1 }
        out
      case 6 =>
        val out = new Array[Short](dataSize)
        var i = 0
        while (i < dataSize) { out(i) = RawG711.alawDecode(p(dataOff + i)); i += 1 }
        out
      case 7 =>
        val out = new Array[Short](dataSize)
        var i = 0
        while (i < dataSize) { out(i) = RawG711.mulawDecode(p(dataOff + i)); i += 1 }
        out
    }
    Clip(rate, channels, samples)
  }

  /** RIFF/WAVE writer for G.711 payloads (format tag 6 = A-law,
    * 7 = mu-law): one companded byte per sample.
    */
  def encodeWavG711(clip: Clip, mulaw: Boolean): Array[Byte] = {
    val n = clip.samples.length
    val pad = n & 1
    val out = new Array[Byte](44 + n + pad)
    def putStr(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putStr(0, "RIFF"); putLe32(4, 36 + n + pad); putStr(8, "WAVE")
    putStr(12, "fmt "); putLe32(16, 16); putLe16(20, if (mulaw) 7 else 6)
    putLe16(22, clip.channels); putLe32(24, clip.sampleRate)
    putLe32(28, clip.sampleRate * clip.channels) // byte rate: 1 B/sample
    putLe16(32, clip.channels); putLe16(34, 8) // block align, bps
    putStr(36, "data"); putLe32(40, n)
    var i = 0
    while (i < n) {
      out(44 + i) =
        if (mulaw) RawG711.mulawEncode(clip.samples(i))
        else RawG711.alawEncode(clip.samples(i))
      i += 1
    }
    out
  }

  def encodeWav(clip: Clip): Array[Byte] = {
    val dataBytes = clip.samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    def putStr(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putStr(0, "RIFF"); putLe32(4, 36 + dataBytes); putStr(8, "WAVE")
    putStr(12, "fmt "); putLe32(16, 16); putLe16(20, 1)
    putLe16(22, clip.channels); putLe32(24, clip.sampleRate)
    putLe32(28, clip.sampleRate * clip.channels * 2) // byte rate
    putLe16(32, clip.channels * 2); putLe16(34, 16) // block align, bps
    putStr(36, "data"); putLe32(40, dataBytes)
    var i = 0
    while (i < clip.samples.length) {
      putLe16(44 + i * 2, clip.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Exact integer aggregates: (sum |s|, sum s^2) — both fit a Long for
    * any realistic clip, so downstream means are one division.
    */
  def amplitudeStats(clip: Clip): (Long, Long) = {
    var sumAbs = 0L; var sumSq = 0L
    var i = 0
    while (i < clip.samples.length) {
      val s = clip.samples(i).toLong
      sumAbs += math.abs(s)
      sumSq += s * s
      i += 1
    }
    (sumAbs, sumSq)
  }

  /** Windowed DSP features over fixed-size sample windows (the audio
    * analog of per-chunk token stats): per window the exact-integer
    * energy (sum of squares), zero-crossing count (sign change between
    * adjacent samples WITHIN the window; s >= 0 counts as positive, the
    * convention that keeps the count a pure integer function of the
    * samples), and peak |amplitude|. Integers only, so an oracle can
    * recompute every value from the synthetic sample formula.
    */
  final case class WindowFeatures(
      winIdx: Int, n: Int, energy: Long, zeroCrossings: Int, peak: Int)

  def windowFeatures(clip: Clip, win: Int): Seq[WindowFeatures] = {
    val out = Seq.newBuilder[WindowFeatures]
    var start = 0
    var idx = 0
    while (start < clip.samples.length) {
      val end = math.min(start + win, clip.samples.length)
      var energy = 0L; var zc = 0; var peak = 0
      var i = start
      while (i < end) {
        val s = clip.samples(i).toInt
        energy += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        if (i > start && ((s >= 0) != (clip.samples(i - 1) >= 0))) zc += 1
        i += 1
      }
      out += WindowFeatures(idx, end - start, energy, zc, peak)
      start = end
      idx += 1
    }
    out.result()
  }
}
