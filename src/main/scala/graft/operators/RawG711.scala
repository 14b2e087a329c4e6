package graft.operators

/** Pure-JVM G.711 codec (ITU-T Rec. G.711): mu-law and A-law
  * companding, the two standard 8-bit lossy telephony encodings.
  * Unlike transform codecs (MP3/AAC, which stay behind the honest
  * stub — no JVM decode path in this container), G.711 is pure
  * integer bit-twiddling and its decode is bit-exact by the spec, so
  * the decoded output is DuckDB-mirrorable and the pipeline entry
  * (multimodal_decode_g711) is oracle-checked end to end: the oracle
  * recomputes the encode->decode quantization Q(s) per sample in SQL.
  *
  * Conventions pinned in G711Spec: mu-law silence byte 0xFF, A-law
  * silence byte 0xD5 (the on-the-wire idle patterns), mu-law max
  * magnitude 32124, A-law max 32256, encode(decode(c)) == c for all
  * 256 codes (except mu-law 0x7F, the negative-zero alias of 0xFF),
  * decode monotone in code magnitude, and quantization error within
  * the half-cell bound across the full 16-bit input sweep.
  *
  * Reference behavior target: the reference engine has no audio path;
  * this is part of the LLM-pipeline multimodal surface (SURVEY §10).
  */
object RawG711 {

  /** mu-law encode of a 16-bit linear sample: clip to 32635, add the
    * bias 0x84, pick the segment (exponent) as the position of the
    * top set bit above bit 7, keep 4 mantissa bits, complement.
    */
  def mulawEncode(sample: Short): Byte = {
    var s = sample.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mantissa = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mantissa)).toByte
  }

  /** mu-law decode: exact inverse quantization (cell midpoint). */
  def mulawDecode(code: Byte): Short = {
    val u = ~code & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** A-law encode: segment 0 is linear (step 16), segments 1-7 double
    * the step; even bits inverted (XOR 0x55) per the spec; sign bit
    * set for non-negative inputs.
    */
  def alawEncode(sample: Short): Byte = {
    var s = sample.toInt
    val positive = s >= 0
    if (!positive) s = -s
    if (s > 32767) s = 32767
    val a =
      if (s < 256) s >> 4
      else {
        var exp = 1
        while (s >= (256 << exp)) exp += 1
        (exp << 4) | ((s >> (exp + 3)) & 0x0f)
      }
    (((if (positive) 0x80 else 0) | a) ^ 0x55).toByte
  }

  /** A-law decode: exact inverse quantization (cell midpoint; segment
    * 0 cells have width 16, midpoint offset 8).
    */
  def alawDecode(code: Byte): Short = {
    val a = (code ^ 0x55) & 0xff
    val exp = (a >> 4) & 7
    val mant = a & 0x0f
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    (if ((a & 0x80) != 0) mag else -mag).toShort
  }
}
