package graft.operators

/** Pure-JVM audio codec for WAV / PCM16: RIFF is a plain byte layout
  * (no compression), so the multimodal pipeline decodes it for real —
  * the audio twin of [[RawImage]]. Compressed audio (MP3/Opus/...)
  * stays behind the stub boundary.
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

  /** RIFF/WAVE with fmt (PCM16 only) and data chunks in any order. */
  def decodeWav(p: Array[Byte]): Clip = {
    require(sniff(p) == "audio/wav", "not a WAV")
    var off = 12
    var rate = 0; var channels = 0
    var samples: Array[Short] = null
    while (off + 8 <= p.length) {
      val id = new String(p, off, 4, "US-ASCII")
      val size = le32(p, off + 4)
      id match {
        case "fmt " =>
          require(le16(p, off + 8) == 1, "only PCM WAV")
          channels = le16(p, off + 10)
          rate = le32(p, off + 12)
          require(le16(p, off + 22) == 16, "only 16-bit WAV")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = le16(p, off + 8 + i * 2).toShort
            i += 1
          }
        case _ => () // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + size + (size & 1) // chunks pad to even lengths
    }
    require(samples != null && rate > 0, "missing fmt/data chunk")
    Clip(rate, channels, samples)
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
