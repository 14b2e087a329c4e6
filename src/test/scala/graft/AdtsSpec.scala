package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RawAdts, RawMp3}

/** Conformance pins for the AAC/ADTS framing layer, hand-computed from
  * the public header layout (ISO/IEC 13818-7 §6.2): bit-field
  * extraction, the sampling-frequency table, explicit 13-bit frame
  * lengths, header-CRC validation, the frame walk, and the typed PCM
  * boundary.
  */
class AdtsSpec extends AnyFunSuite {

  test("header parse decodes every field of a hand-built header") {
    // FF F1 50 80 1A 3F FC: MPEG-4, no CRC, profile LC(01),
    // sr idx 4 = 44100, chan cfg 2, frame length 0x0D1 = 209, 1 block
    val p = new Array[Byte](209)
    p(0) = 0xff.toByte; p(1) = 0xf1.toByte; p(2) = 0x50.toByte
    p(3) = 0x80.toByte; p(4) = 0x1a.toByte; p(5) = 0x3f.toByte
    p(6) = 0xfc.toByte
    val h = RawAdts.parseHeader(p, 0).get
    assert(!h.mpeg2 && h.profile == "LC" && !h.crcProtected)
    assert(h.sampleRate == 44100 && h.channels == 2)
    assert(h.frameBytes == 209 && h.blocks == 1 && h.samplesPerFrame == 1024)
    assert(RawAdts.sniff(p))
  }

  test("reserved / malformed headers are refused") {
    def hdr(bytes: Int*): Option[RawAdts.AdtsHeader] =
      RawAdts.parseHeader(
        (bytes.map(_.toByte) ++ Seq.fill(16)(0.toByte)).toArray, 0)
    assert(hdr(0xfe, 0xf1, 0x50, 0x80, 0x1a, 0x3f, 0xfc).isEmpty) // sync
    assert(hdr(0xff, 0xf3, 0x50, 0x80, 0x1a, 0x3f, 0xfc).isEmpty) // layer != 0
    assert(hdr(0xff, 0xf1, 0x74, 0x80, 0x1a, 0x3f, 0xfc).isEmpty) // sr 13
    assert(hdr(0xff, 0xf1, 0x50, 0x00, 0x1a, 0x3f, 0xfc).isEmpty) // chan 0
    assert(hdr(0xff, 0xf1, 0x50, 0x80, 0x00, 0x5f, 0xfc).isEmpty) // len 2 < 7
  }

  test("frame walk honors explicit lengths; mixed streams via concat") {
    val a = RawAdts.framingPayload(1, 4, 2, nFrames = 3,
      payloadBytes = 100, withCrc = false, seed = 7)
    assert(a.length == 3 * 107)
    val b = RawAdts.framingPayload(0, 11, 1, nFrames = 2,
      payloadBytes = 31, withCrc = true, seed = 8)
    val fs = RawAdts.frames(a ++ b)
    assert(fs.size == 5)
    assert(fs.take(3).forall(f => f._2.profile == "LC" &&
      f._2.sampleRate == 44100 && f._2.channels == 2 && !f._2.crcProtected))
    assert(fs.drop(3).forall(f => f._2.profile == "Main" &&
      f._2.sampleRate == 8000 && f._2.channels == 1 && f._2.crcProtected))
    assert(fs.map(_._1) == Vector(0, 107, 214, 321, 321 + 40))
  }

  test("header CRC validates and catches damage") {
    val p = RawAdts.framingPayload(1, 4, 2, 3, 50, withCrc = true, seed = 3)
    assert(RawAdts.info(p).crcFrames == 3)
    val hurt = p.clone()
    hurt(2) = (hurt(2) ^ 0x04).toByte // sr index bit of frame 0
    // frame 0 still parses (sr idx 4 -> 5) but its stored CRC no
    // longer matches the damaged header
    assert(RawAdts.info(hurt).crcFrames == 2)
  }

  test("whole-stream info: 1024 samples per block, integer duration") {
    // 5 frames @ 48 kHz: 5120 samples, 5120000/48000 = 106 ms
    val p = RawAdts.framingPayload(1, 3, 2, 5, 80, withCrc = false, seed = 2)
    val i = RawAdts.info(p)
    assert(i.samples == 5120 && i.durationMs == 106 && i.frames == 5)
    assert(i.avgBitrateKbps == 5 * 87 * 8 / 106)
  }

  test("PCM decode is the same TYPED boundary as MP3") {
    val p = RawAdts.framingPayload(1, 4, 2, 1, 20, withCrc = false, seed = 1)
    intercept[RawMp3.Mp3DecodeUnsupported] { RawAdts.decode(p) }
  }
}
