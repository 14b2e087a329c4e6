package graft

import graft.operators.{RawAudio, RawG711}
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the G.711 mu-law / A-law codec (RawG711) and its WAV
  * integration (format tags 7 / 6). The decode side is bit-exact by
  * the ITU spec, so known on-the-wire constants (silence bytes, max
  * magnitudes, the first decode-table steps) are pinned literally;
  * the encode side is pinned by quantizer properties over the FULL
  * 16-bit input sweep (idempotence, monotonicity, half-cell error
  * bound) plus all-256-codes round-trips.
  */
class G711Spec extends AnyFunSuite {

  test("published wire constants: silence bytes and max magnitudes") {
    assert(RawG711.mulawEncode(0) == 0xff.toByte) // mu-law idle pattern
    assert(RawG711.alawEncode(0) == 0xd5.toByte)  // A-law idle pattern
    assert(RawG711.mulawDecode(0x80.toByte) == 32124)  // mu-law max
    assert(RawG711.mulawDecode(0x00.toByte) == -32124)
    assert(RawG711.alawDecode(0xaa.toByte) == 32256)   // A-law max
    assert(RawG711.alawDecode(0x2a.toByte) == -32256)
  }

  test("published decode-table steps (first segments)") {
    // mu-law segment 0 decodes to multiples of 8: 0, 8, ..., 120;
    // segment 1 starts at 132 (ITU decode table).
    assert(RawG711.mulawDecode(0xff.toByte) == 0)
    assert(RawG711.mulawDecode(0xfe.toByte) == 8)
    assert(RawG711.mulawDecode(0xf0.toByte) == 120)
    assert(RawG711.mulawDecode(0xef.toByte) == 132)
    // A-law segment 0 decodes to odd multiples of 8: 8, 24, ...;
    // segment 1 starts at 264.
    assert(RawG711.alawDecode(0xd5.toByte) == 8)
    assert(RawG711.alawDecode((0x81 ^ 0x55).toByte) == 24)
    assert(RawG711.alawDecode((0x90 ^ 0x55).toByte) == 264)
    assert(RawG711.alawDecode(0x55.toByte) == -8)
  }

  test("all 256 codes round-trip through decode -> encode") {
    for (c <- 0 until 256) {
      val b = c.toByte
      // mu-law has two zero codes: 0x7F is the negative-zero alias of
      // 0xFF; decode(0x7F) == 0 re-encodes to 0xFF.
      val expectMu = if (c == 0x7f) 0xff.toByte else b
      assert(RawG711.mulawEncode(RawG711.mulawDecode(b)) == expectMu,
        s"mu-law code $c")
      assert(RawG711.alawEncode(RawG711.alawDecode(b)) == b,
        s"A-law code $c")
    }
  }

  test("full 16-bit sweep: idempotence, monotonicity, error bound") {
    var prevMu = Int.MinValue
    var prevAl = Int.MinValue
    var s = -32768
    while (s <= 32767) {
      val sh = s.toShort
      val qMu = RawG711.mulawDecode(RawG711.mulawEncode(sh)).toInt
      val qAl = RawG711.alawDecode(RawG711.alawEncode(sh)).toInt
      // quantizer idempotence on VALUES: re-quantizing the cell
      // midpoint is a fixpoint. (Code-level idempotence does not hold
      // for mu-law: inputs in [-7,-1] land in the negative-zero cell
      // 0x7F but the midpoint 0 re-encodes to the canonical 0xFF.)
      assert(RawG711.mulawDecode(RawG711.mulawEncode(qMu.toShort)) == qMu,
        s"mu idempotence at $s")
      assert(RawG711.alawDecode(RawG711.alawEncode(qAl.toShort)) == qAl,
        s"A idempotence at $s")
      // monotone non-decreasing in the input
      assert(qMu >= prevMu, s"mu monotone at $s")
      assert(qAl >= prevAl, s"A monotone at $s")
      prevMu = qMu; prevAl = qAl
      // half-cell error bound against the clipped input
      val muClip = math.max(-32635, math.min(32635, s))
      val tMu = math.abs(muClip) + 132
      val eMu = math.max(0, 24 - Integer.numberOfLeadingZeros(tMu))
      assert(math.abs(qMu - muClip) <= (4 << eMu), s"mu error at $s")
      val alClip = math.max(-32767, math.min(32767, s))
      val aAbs = math.abs(alClip)
      val eAl = math.max(1, 24 - Integer.numberOfLeadingZeros(aAbs))
      assert(math.abs(qAl - alClip) <= (8 << (eAl - 1)), s"A error at $s")
      // sign preservation (A-law quantizes 0 to +8 — still >= 0)
      if (s >= 0) { assert(qMu >= 0 && qAl > 0) }
      else { assert(qMu <= 0 && qAl < 0) }
      s += 1
    }
  }

  test("WAV format tags 6/7 round-trip through encodeWavG711/decodeWav") {
    val samples = Array.tabulate(321)(i =>
      ((i * 7919 + 31) % 65536 - 32768).toShort)
    val clip = RawAudio.Clip(8000, 1, samples)
    for (mulaw <- Seq(true, false)) {
      val wav = RawAudio.encodeWavG711(clip, mulaw)
      assert(RawAudio.sniff(wav) == "audio/wav")
      val back = RawAudio.decodeWav(wav)
      assert(back.sampleRate == 8000 && back.channels == 1)
      assert(back.samples.length == 321) // odd data chunk padded, not read
      val expect = samples.map { s =>
        if (mulaw) RawG711.mulawDecode(RawG711.mulawEncode(s))
        else RawG711.alawDecode(RawG711.alawEncode(s))
      }
      assert(back.samples.sameElements(expect))
    }
  }
}
