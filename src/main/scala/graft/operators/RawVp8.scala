package graft.operators

/** Pure-JVM lossy-VP8 keyframe decoder (RFC 6386), written from the
  * public spec — closes the last image half of the codec boundary
  * (SURVEY §11.3): WebP lossy streams ('VP8 ' chunks) decode for real.
  *
  * VP8 reconstruction is fully integer-specified: the boolean
  * arithmetic decoder, header/mode/token parsing, dequantization, the
  * inverse DCT/WHT, intra prediction (incl. the frame border
  * conventions: above row = 127, left column = 129, above-right of
  * the rightmost macroblock replicated from its last above pixel) and
  * the normal/simple loop filters all produce bit-exact Y/U/V planes
  * across conforming decoders. Vp8Spec pins that: every fixture under
  * src/test/resources/vp8/ was encoded AND decoded by the system
  * reference libwebp (tools/gen_vp8_golden.py), and this decoder must
  * reproduce libwebp's YUV output byte for byte. Only the YUV->RGB
  * presentation step (4:2:0 upsampling) is implementation-defined —
  * same adjudicated boundary as RawJpeg's inverse DCT.
  *
  * Scope: keyframes only, which is exactly the WebP-lossy surface
  * (a 'VP8 ' chunk is a single keyframe by construction; interframes
  * exist only in .ivf/video streams). Constant tables are the public
  * spec constants, extracted from the reference libwebp binary by
  * tools/gen_vp8_tables.py (see [[Vp8Tables]]).
  *
  * Scale shape: one self-contained decode per document payload,
  * executor-side (mapPartitions in MultimodalOps); no driver state,
  * no shuffle of raw bytes beyond the scan.
  */
object RawVp8 {

  /** Decoded 4:2:0 planes, cropped to the visible frame:
    * y is width*height; u and v are ceil(w/2)*ceil(h/2).
    */
  final case class Yuv(width: Int, height: Int,
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  // --------------------------------------------- boolean decoder (§7)

  private final class Bool(buf: Array[Byte], start: Int, end: Int) {
    private[this] var range = 255
    private[this] var value = 0
    private[this] var bitCount = 0
    private[this] var pos = start
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int = {
      val b = if (pos < end) buf(pos) & 0xff else 0 // past-end reads are 0
      pos += 1
      b
    }

    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) {
        ret = 1
        range -= split
        value -= bigSplit
      } else {
        range = split
      }
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          value |= nextByte()
        }
      }
      ret
    }

    def flag(): Int = bit(128)

    /** n-bit unsigned literal, MSB first. */
    def uint(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }

    /** magnitude-then-sign literal. */
    def sint(n: Int): Int = {
      val v = uint(n)
      if (flag() == 1) -v else v
    }
  }

  // ------------------------------------------------- small constants

  // 16x16 / chroma modes
  private final val DcPred = 0
  private final val VPred = 1
  private final val HPred = 2
  private final val TmPred = 3
  private final val BPred = 4

  // 4x4 modes (enum order fixed by the spec's tree)
  private final val BDc = 0
  private final val BTm = 1
  private final val BVe = 2
  private final val BHe = 3
  private final val BLd = 4
  private final val BRd = 5
  private final val BVr = 6
  private final val BVl = 7
  private final val BHd = 8
  private final val BHu = 9

  private val zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val bands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // extra-bit probabilities for token categories 3..6 (§13.2)
  private val cat3 = Array(173, 148, 140)
  private val cat4 = Array(176, 155, 140, 135)
  private val cat5 = Array(180, 157, 141, 134, 130)
  private val cat6 = Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)

  // keyframe mode trees (§11.3): probabilities are spec constants
  private val kfYModeProbs = Array(145, 156, 163, 128)
  private val kfUvModeProbs = Array(142, 114, 183)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clamp127(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v
  private def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
  private def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2

  // ------------------------------------------------------ entry point

  /** Decode a raw VP8 frame (the contents of a 'VP8 ' RIFF chunk). */
  def decode(data: Array[Byte]): Yuv = decode(data, applyFilter = true)

  /** Test hook: `applyFilter = false` mirrors libwebp's
    * bypass_filtering option (reconstruction-only conformance).
    */
  private[graft] def decode(data: Array[Byte], applyFilter: Boolean): Yuv = {
    require(data.length >= 10, "VP8: truncated frame header")
    val tag = (data(0) & 0xff) | ((data(1) & 0xff) << 8) | ((data(2) & 0xff) << 16)
    require((tag & 1) == 0, "VP8: not a key frame")
    val version = (tag >> 1) & 7
    require(version <= 3, s"VP8: bad version $version")
    val part0Size = tag >>> 5
    require((data(3) & 0xff) == 0x9d && (data(4) & 0xff) == 0x01 &&
      (data(5) & 0xff) == 0x2a, "VP8: bad keyframe start code")
    val width = ((data(6) & 0xff) | ((data(7) & 0xff) << 8)) & 0x3fff
    val height = ((data(8) & 0xff) | ((data(9) & 0xff) << 8)) & 0x3fff
    require(width > 0 && height > 0, "VP8: zero dimension")

    val part0Start = 10
    require(part0Start + part0Size <= data.length, "VP8: truncated partition 0")
    val bd = new Bool(data, part0Start, part0Start + part0Size)

    // ---- frame header (§9) ----
    bd.flag() // color_space (0 for all conforming keyframes)
    bd.flag() // clamping_type (we always clamp; identical on conforming streams)

    // segmentation
    var segEnabled = false
    var segUpdateMap = false
    var segAbs = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    segEnabled = bd.flag() == 1
    if (segEnabled) {
      segUpdateMap = bd.flag() == 1
      val updData = bd.flag() == 1
      if (updData) {
        segAbs = bd.flag() == 1
        var i = 0
        while (i < 4) { if (bd.flag() == 1) segQ(i) = bd.sint(7); i += 1 }
        i = 0
        while (i < 4) { if (bd.flag() == 1) segLf(i) = bd.sint(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) { if (bd.flag() == 1) segTreeProbs(i) = bd.uint(8); i += 1 }
      }
    }

    // loop filter header
    val simpleFilter = bd.flag() == 1
    val filterLevel = bd.uint(6)
    val sharpness = bd.uint(3)
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    val lfDeltaEnabled = bd.flag() == 1
    if (lfDeltaEnabled && bd.flag() == 1) { // mode_ref_lf_delta_update
      var i = 0
      while (i < 4) { if (bd.flag() == 1) refLfDeltas(i) = bd.sint(6); i += 1 }
      i = 0
      while (i < 4) { if (bd.flag() == 1) modeLfDeltas(i) = bd.sint(6); i += 1 }
    }

    // token partitions
    val numParts = 1 << bd.uint(2)
    val sizesOff = part0Start + part0Size
    val partBools = new Array[Bool](numParts)
    var dataOff = sizesOff + (numParts - 1) * 3
    var pi = 0
    while (pi < numParts) {
      val size =
        if (pi < numParts - 1) {
          val o = sizesOff + pi * 3
          (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) | ((data(o + 2) & 0xff) << 16)
        } else data.length - dataOff
      require(size >= 0 && dataOff + size <= data.length, "VP8: bad partition size")
      partBools(pi) = new Bool(data, dataOff, dataOff + size)
      dataOff += size
      pi += 1
    }

    // quantizer indices
    val yacQi = bd.uint(7)
    def qDelta(): Int = if (bd.flag() == 1) bd.sint(4) else 0
    val ydcDelta = qDelta()
    val y2dcDelta = qDelta()
    val y2acDelta = qDelta()
    val uvdcDelta = qDelta()
    val uvacDelta = qDelta()

    bd.flag() // refresh_entropy_probs (irrelevant for a standalone keyframe)

    // coefficient probability updates
    val probs = Vp8Tables.coeffProbs.clone()
    val upd = Vp8Tables.coeffUpdateProbs
    var ti = 0
    while (ti < 1056) {
      if (bd.bit(upd(ti) & 0xff) == 1) probs(ti) = bd.uint(8).toByte
      ti += 1
    }

    val mbNoSkipCoeff = bd.flag() == 1
    val probSkipFalse = if (mbNoSkipCoeff) bd.uint(8) else 0

    // ---- per-segment dequantization factors (§14.1) ----
    def clampQ(q: Int): Int = if (q < 0) 0 else if (q > 127) 127 else q
    val nSeg = if (segEnabled) 4 else 1
    val qYdc = new Array[Int](nSeg); val qYac = new Array[Int](nSeg)
    val qY2dc = new Array[Int](nSeg); val qY2ac = new Array[Int](nSeg)
    val qUvdc = new Array[Int](nSeg); val qUvac = new Array[Int](nSeg)
    var si = 0
    while (si < nSeg) {
      val base = clampQ(
        if (segEnabled) { if (segAbs) segQ(si) else yacQi + segQ(si) } else yacQi)
      qYdc(si) = Vp8Tables.dcQLookup(clampQ(base + ydcDelta))
      qYac(si) = Vp8Tables.acQLookup(base)
      qY2dc(si) = Vp8Tables.dcQLookup(clampQ(base + y2dcDelta)) * 2
      qY2ac(si) = { val v = Vp8Tables.acQLookup(clampQ(base + y2acDelta)) * 155 / 100; if (v < 8) 8 else v }
      qUvdc(si) = { val v = Vp8Tables.dcQLookup(clampQ(base + uvdcDelta)); if (v > 132) 132 else v }
      qUvac(si) = Vp8Tables.acQLookup(clampQ(base + uvacDelta))
      si += 1
    }

    // ---- pass 1: macroblock headers (modes / segments / skip, §11) ----
    val mbW = (width + 15) >> 4
    val mbH = (height + 15) >> 4
    val nMb = mbW * mbH
    val ymodes = new Array[Byte](nMb)
    val uvmodes = new Array[Byte](nMb)
    val segments = new Array[Byte](nMb)
    val skips = new Array[Boolean](nMb)
    val bmodes = new Array[Byte](nMb * 16)

    val kfb = Vp8Tables.kfBModeProbs
    // The table was extracted from libwebp, whose internal bmode enum
    // reorders the spec's: RD,VR,LD,VL sit at 4,5,6,7 (spec: LD,RD,VR,VL).
    // Map spec-order context modes to the table's row/column order.
    val kfbIdx = Array(0, 1, 2, 3, 6, 4, 5, 7, 8, 9)

    def readBMode(above: Int, left: Int): Int = {
      val p = (kfbIdx(above) * 10 + kfbIdx(left)) * 9
      if (bd.bit(kfb(p) & 0xff) == 0) BDc
      else if (bd.bit(kfb(p + 1) & 0xff) == 0) BTm
      else if (bd.bit(kfb(p + 2) & 0xff) == 0) BVe
      else if (bd.bit(kfb(p + 3) & 0xff) == 0) {
        if (bd.bit(kfb(p + 4) & 0xff) == 0) BHe
        else if (bd.bit(kfb(p + 5) & 0xff) == 0) BRd
        else BVr
      } else {
        if (bd.bit(kfb(p + 6) & 0xff) == 0) BLd
        else if (bd.bit(kfb(p + 7) & 0xff) == 0) BVl
        else if (bd.bit(kfb(p + 8) & 0xff) == 0) BHd
        else BHu
      }
    }

    // implied 4x4 context mode of a 16x16-predicted neighbor
    def impliedB(ymode: Int): Int = ymode match {
      case DcPred => BDc
      case VPred => BVe
      case HPred => BHe
      case _ => BTm
    }

    val aboveB = new Array[Byte](mbW * 4) // bottom-row bmodes per MB column
    val leftB = new Array[Byte](4)
    var mby = 0
    var mb = 0
    while (mby < mbH) {
      java.util.Arrays.fill(leftB, 0.toByte)
      var mbx = 0
      while (mbx < mbW) {
        if (segEnabled && segUpdateMap) {
          segments(mb) = (if (bd.bit(segTreeProbs(0)) == 0) {
            if (bd.bit(segTreeProbs(1)) == 0) 0 else 1
          } else {
            if (bd.bit(segTreeProbs(2)) == 0) 2 else 3
          }).toByte
        }
        if (mbNoSkipCoeff) skips(mb) = bd.bit(probSkipFalse) == 1
        // keyframe luma mode tree
        val ymode =
          if (bd.bit(kfYModeProbs(0)) == 0) BPred
          else if (bd.bit(kfYModeProbs(1)) == 0) {
            if (bd.bit(kfYModeProbs(2)) == 0) DcPred else VPred
          } else {
            if (bd.bit(kfYModeProbs(3)) == 0) HPred else TmPred
          }
        ymodes(mb) = ymode.toByte
        if (ymode == BPred) {
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val above = if (r == 0) aboveB(mbx * 4 + c) else bmodes(mb * 16 + (r - 1) * 4 + c)
              val left = if (c == 0) leftB(r) else bmodes(mb * 16 + r * 4 + c - 1)
              val m = readBMode(above, left)
              bmodes(mb * 16 + r * 4 + c) = m.toByte
              c += 1
            }
            r += 1
          }
          var k = 0
          while (k < 4) {
            aboveB(mbx * 4 + k) = bmodes(mb * 16 + 12 + k)
            leftB(k) = bmodes(mb * 16 + k * 4 + 3)
            k += 1
          }
        } else {
          val imp = impliedB(ymode).toByte
          var k = 0
          while (k < 4) { aboveB(mbx * 4 + k) = imp; leftB(k) = imp; k += 1 }
        }
        // chroma mode tree
        uvmodes(mb) =
          (if (bd.bit(kfUvModeProbs(0)) == 0) DcPred
           else if (bd.bit(kfUvModeProbs(1)) == 0) VPred
           else if (bd.bit(kfUvModeProbs(2)) == 0) HPred
           else TmPred).toByte
        mb += 1
        mbx += 1
      }
      mby += 1
    }

    // ---- pass 2: residuals + reconstruction ----
    // Padded planes: 1 top border row (127), 1 left border column (129),
    // +4 luma columns on the right for above-right reads.
    val yw = mbW * 16; val yh = mbH * 16
    val cw = mbW * 8; val ch = mbH * 8
    val ypw = 1 + yw + 4
    val cpw = 1 + cw
    val yPlane = new Array[Int](ypw * (yh + 1))
    val uPlane = new Array[Int](cpw * (ch + 1))
    val vPlane = new Array[Int](cpw * (ch + 1))
    java.util.Arrays.fill(yPlane, 0, ypw, 127)
    java.util.Arrays.fill(uPlane, 0, cpw, 127)
    java.util.Arrays.fill(vPlane, 0, cpw, 127)
    var row = 1
    while (row <= yh) { yPlane(row * ypw) = 129; row += 1 }
    row = 1
    while (row <= ch) { uPlane(row * cpw) = 129; vPlane(row * cpw) = 129; row += 1 }
    // pixel (x, y) of plane p lives at (y + 1) * stride + (x + 1)
    @inline def yAt(x: Int, y: Int): Int = (y + 1) * ypw + (x + 1)
    @inline def cAt(x: Int, y: Int): Int = (y + 1) * cpw + (x + 1)

    // nonzero-coefficient contexts
    val aboveNzY = new Array[Int](mbW * 4)
    val aboveNzU = new Array[Int](mbW * 2)
    val aboveNzV = new Array[Int](mbW * 2)
    val aboveNzY2 = new Array[Int](mbW)
    val leftNzY = new Array[Int](4)
    val leftNzU = new Array[Int](2)
    val leftNzV = new Array[Int](2)
    var leftNzY2 = 0

    val hasCoeffs = new Array[Boolean](nMb) // for the loop filter
    val coeff = new Array[Int](16)
    val y2coeff = new Array[Int](16)
    val dcs = new Array[Int](16)
    val blockCoeffs = new Array[Int](24 * 16) // 16 Y + 4 U + 4 V
    val pred = new Array[Int](16)

    /** Token decode for one 4x4 block (§13.3). Fills `out` (dequantized,
      * natural order) and returns true iff any coefficient is nonzero.
      */
    def decodeBlock(td: Bool, blockType: Int, firstCoeff: Int, ctx0: Int,
        qDc: Int, qAc: Int, out: Array[Int]): Boolean = {
      java.util.Arrays.fill(out, 0)
      var n = firstCoeff
      var ctx = ctx0
      var skipEob = false
      var any = false
      var done = false
      while (n < 16 && !done) {
        val p = ((blockType * 8 + bands(n)) * 3 + ctx) * 11
        if (!skipEob && td.bit(probs(p) & 0xff) == 0) {
          done = true
        } else if (td.bit(probs(p + 1) & 0xff) == 0) {
          ctx = 0
          skipEob = true
          n += 1
        } else {
          skipEob = false
          var v = 0
          if (td.bit(probs(p + 2) & 0xff) == 0) {
            v = 1
            ctx = 1
          } else {
            ctx = 2
            if (td.bit(probs(p + 3) & 0xff) == 0) {
              if (td.bit(probs(p + 4) & 0xff) == 0) v = 2
              else v = 3 + td.bit(probs(p + 5) & 0xff)
            } else if (td.bit(probs(p + 6) & 0xff) == 0) {
              if (td.bit(probs(p + 7) & 0xff) == 0) v = 5 + td.bit(159)
              else v = 7 + 2 * td.bit(165) + td.bit(145)
            } else {
              val (base, extra) =
                if (td.bit(probs(p + 8) & 0xff) == 0) {
                  if (td.bit(probs(p + 9) & 0xff) == 0) (11, cat3) else (19, cat4)
                } else {
                  if (td.bit(probs(p + 10) & 0xff) == 0) (35, cat5) else (67, cat6)
                }
              var bits = 0
              var k = 0
              while (k < extra.length) { bits = (bits << 1) | td.bit(extra(k)); k += 1 }
              v = base + bits
            }
          }
          any = true
          val signed = if (td.flag() == 1) -v else v
          out(zigzag(n)) = signed * (if (n == 0) qDc else qAc)
          n += 1
        }
      }
      any
    }

    /** Inverse Walsh-Hadamard transform for the Y2 block (§14.3). */
    def iwht(in: Array[Int], out: Array[Int]): Unit = {
      val t = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = in(i) + in(12 + i)
        val b1 = in(4 + i) + in(8 + i)
        val c1 = in(4 + i) - in(8 + i)
        val d1 = in(i) - in(12 + i)
        t(i) = a1 + b1
        t(4 + i) = c1 + d1
        t(8 + i) = a1 - b1
        t(12 + i) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = t(4 * i) + t(4 * i + 3)
        val b1 = t(4 * i + 1) + t(4 * i + 2)
        val c1 = t(4 * i + 1) - t(4 * i + 2)
        val d1 = t(4 * i) - t(4 * i + 3)
        out(4 * i) = (a1 + b1 + 3) >> 3
        out(4 * i + 1) = (c1 + d1 + 3) >> 3
        out(4 * i + 2) = (a1 - b1 + 3) >> 3
        out(4 * i + 3) = (d1 - c1 + 3) >> 3
        i += 1
      }
    }

    /** Inverse 4x4 DCT (§14.3); adds the residual into plane at (x0,y0). */
    def idctAdd(in: Array[Int], plane: Array[Int], stride: Int, base: Int): Unit = {
      val t = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val v0 = in(i); val v1 = in(4 + i); val v2 = in(8 + i); val v3 = in(12 + i)
        val a1 = v0 + v2
        val b1 = v0 - v2
        val c1 = ((v1 * 35468) >> 16) - (v3 + ((v3 * 20091) >> 16))
        val d1 = (v1 + ((v1 * 20091) >> 16)) + ((v3 * 35468) >> 16)
        t(i) = a1 + d1
        t(12 + i) = a1 - d1
        t(4 + i) = b1 + c1
        t(8 + i) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val w0 = t(4 * i); val w1 = t(4 * i + 1); val w2 = t(4 * i + 2); val w3 = t(4 * i + 3)
        val a1 = w0 + w2
        val b1 = w0 - w2
        val c1 = ((w1 * 35468) >> 16) - (w3 + ((w3 * 20091) >> 16))
        val d1 = (w1 + ((w1 * 20091) >> 16)) + ((w3 * 35468) >> 16)
        val o = base + i * stride
        plane(o) = clamp255(plane(o) + ((a1 + d1 + 4) >> 3))
        plane(o + 1) = clamp255(plane(o + 1) + ((b1 + c1 + 4) >> 3))
        plane(o + 2) = clamp255(plane(o + 2) + ((b1 - c1 + 4) >> 3))
        plane(o + 3) = clamp255(plane(o + 3) + ((a1 - d1 + 4) >> 3))
        i += 1
      }
    }

    // ---- whole-plane intra predictors (16x16 luma / 8x8 chroma, §12.2) ----
    def predictBig(plane: Array[Int], stride: Int, x0: Int, y0: Int, size: Int,
        mode: Int, hasAbove: Boolean, hasLeft: Boolean): Unit = {
      val base = (y0 + 1) * stride + (x0 + 1)
      mode match {
        case DcPred =>
          var dc = 0
          if (hasAbove && hasLeft) {
            var i = 0
            while (i < size) { dc += plane(base - stride + i) + plane(base + i * stride - 1); i += 1 }
            dc = (dc + size) >> (if (size == 16) 5 else 4)
          } else if (hasAbove) {
            var i = 0
            while (i < size) { dc += plane(base - stride + i); i += 1 }
            dc = (dc + size / 2) >> (if (size == 16) 4 else 3)
          } else if (hasLeft) {
            var i = 0
            while (i < size) { dc += plane(base + i * stride - 1); i += 1 }
            dc = (dc + size / 2) >> (if (size == 16) 4 else 3)
          } else dc = 128
          var r = 0
          while (r < size) {
            var c = 0
            while (c < size) { plane(base + r * stride + c) = dc; c += 1 }
            r += 1
          }
        case VPred =>
          var r = 0
          while (r < size) {
            var c = 0
            while (c < size) { plane(base + r * stride + c) = plane(base - stride + c); c += 1 }
            r += 1
          }
        case HPred =>
          var r = 0
          while (r < size) {
            val l = plane(base + r * stride - 1)
            var c = 0
            while (c < size) { plane(base + r * stride + c) = l; c += 1 }
            r += 1
          }
        case _ => // TM
          val p = plane(base - stride - 1)
          var r = 0
          while (r < size) {
            val l = plane(base + r * stride - 1)
            var c = 0
            while (c < size) {
              plane(base + r * stride + c) = clamp255(l + plane(base - stride + c) - p)
              c += 1
            }
            r += 1
          }
      }
    }

    // ---- 4x4 intra predictors (§12.3) into `pred` (row-major 16) ----
    // A(0..3) above, AR(0..3) above-right, L(0..3) left, P above-left.
    def predict4(mode: Int, plane: Array[Int], stride: Int, base: Int,
        arOverride: Array[Int]): Unit = {
      @inline def A(i: Int) = plane(base - stride + i)
      @inline def L(i: Int) = plane(base + i * stride - 1)
      @inline def AR(i: Int) = if (arOverride != null) arOverride(i) else plane(base - stride + 4 + i)
      val P = plane(base - stride - 1)
      mode match {
        case BDc =>
          val dc = (A(0) + A(1) + A(2) + A(3) + L(0) + L(1) + L(2) + L(3) + 4) >> 3
          var i = 0
          while (i < 16) { pred(i) = dc; i += 1 }
        case BTm =>
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) { pred(r * 4 + c) = clamp255(L(r) + A(c) - P); c += 1 }
            r += 1
          }
        case BVe =>
          pred(0) = avg3(P, A(0), A(1)); pred(1) = avg3(A(0), A(1), A(2))
          pred(2) = avg3(A(1), A(2), A(3)); pred(3) = avg3(A(2), A(3), AR(0))
          var r = 1
          while (r < 4) {
            pred(r * 4) = pred(0); pred(r * 4 + 1) = pred(1)
            pred(r * 4 + 2) = pred(2); pred(r * 4 + 3) = pred(3)
            r += 1
          }
        case BHe =>
          val r0 = avg3(P, L(0), L(1)); val r1 = avg3(L(0), L(1), L(2))
          val r2 = avg3(L(1), L(2), L(3)); val r3 = avg3(L(2), L(3), L(3))
          var c = 0
          while (c < 4) {
            pred(c) = r0; pred(4 + c) = r1; pred(8 + c) = r2; pred(12 + c) = r3
            c += 1
          }
        case BLd =>
          val a0 = A(0); val a1 = A(1); val a2 = A(2); val a3 = A(3)
          val a4 = AR(0); val a5 = AR(1); val a6 = AR(2); val a7 = AR(3)
          pred(0) = avg3(a0, a1, a2)
          pred(1) = avg3(a1, a2, a3); pred(4) = pred(1)
          pred(2) = avg3(a2, a3, a4); pred(5) = pred(2); pred(8) = pred(2)
          pred(3) = avg3(a3, a4, a5); pred(6) = pred(3); pred(9) = pred(3); pred(12) = pred(3)
          pred(7) = avg3(a4, a5, a6); pred(10) = pred(7); pred(13) = pred(7)
          pred(11) = avg3(a5, a6, a7); pred(14) = pred(11)
          pred(15) = avg3(a6, a7, a7)
        case BRd =>
          val e0 = L(3); val e1 = L(2); val e2 = L(1); val e3 = L(0)
          val e4 = P; val e5 = A(0); val e6 = A(1); val e7 = A(2); val e8 = A(3)
          pred(12) = avg3(e0, e1, e2)
          pred(8) = avg3(e1, e2, e3); pred(13) = pred(8)
          pred(4) = avg3(e2, e3, e4); pred(9) = pred(4); pred(14) = pred(4)
          pred(0) = avg3(e3, e4, e5); pred(5) = pred(0); pred(10) = pred(0); pred(15) = pred(0)
          pred(1) = avg3(e4, e5, e6); pred(6) = pred(1); pred(11) = pred(1)
          pred(2) = avg3(e5, e6, e7); pred(7) = pred(2)
          pred(3) = avg3(e6, e7, e8)
        case BVr =>
          val e1 = L(2); val e2 = L(1); val e3 = L(0); val e4 = P
          val e5 = A(0); val e6 = A(1); val e7 = A(2); val e8 = A(3)
          pred(0) = avg2(e4, e5); pred(9) = pred(0)
          pred(1) = avg2(e5, e6); pred(10) = pred(1)
          pred(2) = avg2(e6, e7); pred(11) = pred(2)
          pred(3) = avg2(e7, e8)
          pred(4) = avg3(e3, e4, e5); pred(13) = pred(4)
          pred(5) = avg3(e4, e5, e6); pred(14) = pred(5)
          pred(6) = avg3(e5, e6, e7); pred(15) = pred(6)
          pred(7) = avg3(e6, e7, e8)
          pred(8) = avg3(e2, e3, e4)
          pred(12) = avg3(e1, e2, e3)
        case BVl =>
          val a0 = A(0); val a1 = A(1); val a2 = A(2); val a3 = A(3)
          val a4 = AR(0); val a5 = AR(1); val a6 = AR(2); val a7 = AR(3)
          pred(0) = avg2(a0, a1)
          pred(1) = avg2(a1, a2); pred(8) = pred(1)
          pred(2) = avg2(a2, a3); pred(9) = pred(2)
          pred(3) = avg2(a3, a4); pred(10) = pred(3)
          pred(4) = avg3(a0, a1, a2)
          pred(5) = avg3(a1, a2, a3); pred(12) = pred(5)
          pred(6) = avg3(a2, a3, a4); pred(13) = pred(6)
          pred(7) = avg3(a3, a4, a5); pred(14) = pred(7)
          pred(11) = avg3(a4, a5, a6)
          pred(15) = avg3(a5, a6, a7)
        case BHd =>
          val e0 = L(3); val e1 = L(2); val e2 = L(1); val e3 = L(0)
          val e4 = P; val e5 = A(0); val e6 = A(1); val e7 = A(2)
          pred(12) = avg2(e0, e1)
          pred(13) = avg3(e0, e1, e2)
          pred(8) = avg2(e1, e2); pred(14) = pred(8)
          pred(9) = avg3(e1, e2, e3); pred(15) = pred(9)
          pred(4) = avg2(e2, e3); pred(10) = pred(4)
          pred(5) = avg3(e2, e3, e4); pred(11) = pred(5)
          pred(0) = avg2(e3, e4); pred(6) = pred(0)
          pred(1) = avg3(e3, e4, e5); pred(7) = pred(1)
          pred(2) = avg3(e4, e5, e6)
          pred(3) = avg3(e5, e6, e7)
        case _ => // BHu
          val l0 = L(0); val l1 = L(1); val l2 = L(2); val l3 = L(3)
          pred(0) = avg2(l0, l1)
          pred(1) = avg3(l0, l1, l2)
          pred(2) = avg2(l1, l2); pred(4) = pred(2)
          pred(3) = avg3(l1, l2, l3); pred(5) = pred(3)
          pred(6) = avg2(l2, l3); pred(8) = pred(6)
          pred(7) = avg3(l2, l3, l3); pred(9) = pred(7)
          pred(10) = l3; pred(11) = l3
          pred(12) = l3; pred(13) = l3; pred(14) = l3; pred(15) = l3
      }
    }

    val mbAboveRight = new Array[Int](4)

    mb = 0
    mby = 0
    while (mby < mbH) {
      val td = partBools(mby % numParts)
      java.util.Arrays.fill(leftNzY, 0)
      java.util.Arrays.fill(leftNzU, 0)
      java.util.Arrays.fill(leftNzV, 0)
      leftNzY2 = 0
      var mbx = 0
      while (mbx < mbW) {
        val seg = if (segEnabled) segments(mb) else 0
        val ymode = ymodes(mb)
        val isB = ymode == BPred
        val hasY2 = !isB
        var anyNz = false

        if (!skips(mb)) {
          // Y2 block first (type 1)
          if (hasY2) {
            val nz = decodeBlock(td, 1, 0, aboveNzY2(mbx) + leftNzY2,
              qY2dc(seg), qY2ac(seg), y2coeff)
            aboveNzY2(mbx) = if (nz) 1 else 0
            leftNzY2 = if (nz) 1 else 0
            if (nz) anyNz = true
            iwht(y2coeff, dcs)
          }
          // 16 luma blocks
          val yType = if (hasY2) 0 else 3
          val yFirst = if (hasY2) 1 else 0
          val nzY = new Array[Int](16)
          var i = 0
          while (i < 16) {
            val r = i >> 2; val c = i & 3
            val ctxA = if (r == 0) aboveNzY(mbx * 4 + c) else nzY(i - 4)
            val ctxL = if (c == 0) leftNzY(r) else nzY(i - 1)
            val nz = decodeBlock(td, yType, yFirst, ctxA + ctxL,
              qYdc(seg), qYac(seg), coeff)
            if (hasY2) coeff(0) = dcs(i)
            System.arraycopy(coeff, 0, blockCoeffs, i * 16, 16)
            nzY(i) = if (nz) 1 else 0
            if (nz) anyNz = true
            i += 1
          }
          var k = 0
          while (k < 4) {
            aboveNzY(mbx * 4 + k) = nzY(12 + k)
            leftNzY(k) = nzY(4 * k + 3)
            k += 1
          }
          // chroma blocks (type 2)
          val nzU = new Array[Int](4)
          i = 0
          while (i < 4) {
            val r = i >> 1; val c = i & 1
            val ctxA = if (r == 0) aboveNzU(mbx * 2 + c) else nzU(i - 2)
            val ctxL = if (c == 0) leftNzU(r) else nzU(i - 1)
            val nz = decodeBlock(td, 2, 0, ctxA + ctxL, qUvdc(seg), qUvac(seg), coeff)
            System.arraycopy(coeff, 0, blockCoeffs, (16 + i) * 16, 16)
            nzU(i) = if (nz) 1 else 0
            if (nz) anyNz = true
            i += 1
          }
          aboveNzU(mbx * 2) = nzU(2); aboveNzU(mbx * 2 + 1) = nzU(3)
          leftNzU(0) = nzU(1); leftNzU(1) = nzU(3)
          val nzV = new Array[Int](4)
          i = 0
          while (i < 4) {
            val r = i >> 1; val c = i & 1
            val ctxA = if (r == 0) aboveNzV(mbx * 2 + c) else nzV(i - 2)
            val ctxL = if (c == 0) leftNzV(r) else nzV(i - 1)
            val nz = decodeBlock(td, 2, 0, ctxA + ctxL, qUvdc(seg), qUvac(seg), coeff)
            System.arraycopy(coeff, 0, blockCoeffs, (20 + i) * 16, 16)
            nzV(i) = if (nz) 1 else 0
            if (nz) anyNz = true
            i += 1
          }
          aboveNzV(mbx * 2) = nzV(2); aboveNzV(mbx * 2 + 1) = nzV(3)
          leftNzV(0) = nzV(1); leftNzV(1) = nzV(3)
        } else {
          // skipped MB: no tokens; contexts are zeroed (Y2 only when present)
          java.util.Arrays.fill(blockCoeffs, 0)
          var k = 0
          while (k < 4) { aboveNzY(mbx * 4 + k) = 0; leftNzY(k) = 0; k += 1 }
          k = 0
          while (k < 2) {
            aboveNzU(mbx * 2 + k) = 0; leftNzU(k) = 0
            aboveNzV(mbx * 2 + k) = 0; leftNzV(k) = 0
            k += 1
          }
          if (hasY2) { aboveNzY2(mbx) = 0; leftNzY2 = 0 }
        }
        hasCoeffs(mb) = anyNz

        // ---- reconstruction ----
        val x0 = mbx * 16; val y0 = mby * 16
        if (isB) {
          // capture the MB-level above-right (row -1, cols 16..19) once:
          // right-column subblocks below the top row must use these, not
          // pixels reconstructed in this frame row (§12.3)
          var k = 0
          while (k < 4) { mbAboveRight(k) = yPlane(yAt(x0 + 16 + k, y0 - 1)); k += 1 }
          var i = 0
          while (i < 16) {
            val r = i >> 2; val c = i & 3
            val bx = x0 + c * 4; val by = y0 + r * 4
            val base = yAt(bx, by)
            val ar = if (c == 3) mbAboveRight else null
            predict4(bmodes(mb * 16 + i), yPlane, ypw, base, ar)
            // write prediction then add residual in place
            var rr = 0
            while (rr < 4) {
              var cc = 0
              while (cc < 4) { yPlane(base + rr * ypw + cc) = pred(rr * 4 + cc); cc += 1 }
              rr += 1
            }
            if (!skips(mb)) {
              System.arraycopy(blockCoeffs, i * 16, coeff, 0, 16)
              idctAdd(coeff, yPlane, ypw, base)
            }
            i += 1
          }
        } else {
          predictBig(yPlane, ypw, x0, y0, 16, ymode, mby > 0, mbx > 0)
          if (!skips(mb)) {
            var i = 0
            while (i < 16) {
              val r = i >> 2; val c = i & 3
              System.arraycopy(blockCoeffs, i * 16, coeff, 0, 16)
              idctAdd(coeff, yPlane, ypw, yAt(x0 + c * 4, y0 + r * 4))
              i += 1
            }
          }
        }
        // chroma
        val cx0 = mbx * 8; val cy0 = mby * 8
        val uvm = uvmodes(mb)
        predictBig(uPlane, cpw, cx0, cy0, 8, uvm, mby > 0, mbx > 0)
        predictBig(vPlane, cpw, cx0, cy0, 8, uvm, mby > 0, mbx > 0)
        if (!skips(mb)) {
          var i = 0
          while (i < 4) {
            val r = i >> 1; val c = i & 1
            System.arraycopy(blockCoeffs, (16 + i) * 16, coeff, 0, 16)
            idctAdd(coeff, uPlane, cpw, cAt(cx0 + c * 4, cy0 + r * 4))
            System.arraycopy(blockCoeffs, (20 + i) * 16, coeff, 0, 16)
            idctAdd(coeff, vPlane, cpw, cAt(cx0 + c * 4, cy0 + r * 4))
            i += 1
          }
        }
        mb += 1
        mbx += 1
      }
      // right padding for above-right reads of the next MB row:
      // replicate the last above pixel (libwebp/RFC convention)
      val lastRow = mby * 16 + 15
      val edge = yPlane(yAt(yw - 1, lastRow))
      var k = 0
      while (k < 4) { yPlane(yAt(yw + k, lastRow)) = edge; k += 1 }
      mby += 1
    }

    // ---- loop filter (§15) ----
    if (applyFilter && (filterLevel > 0 || (segEnabled && segLf.exists(_ != 0)))) {
      loopFilter(yPlane, uPlane, vPlane, ypw, cpw, mbW, mbH,
        ymodes, segments, hasCoeffs, skips,
        simpleFilter, filterLevel, sharpness,
        segEnabled, segAbs, segLf, lfDeltaEnabled, refLfDeltas, modeLfDeltas)
    }

    // ---- crop ----
    val outY = new Array[Byte](width * height)
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) { outY(yy * width + xx) = yPlane(yAt(xx, yy)).toByte; xx += 1 }
      yy += 1
    }
    val ocw = (width + 1) / 2; val och = (height + 1) / 2
    val outU = new Array[Byte](ocw * och)
    val outV = new Array[Byte](ocw * och)
    yy = 0
    while (yy < och) {
      var xx = 0
      while (xx < ocw) {
        outU(yy * ocw + xx) = uPlane(cAt(xx, yy)).toByte
        outV(yy * ocw + xx) = vPlane(cAt(xx, yy)).toByte
        xx += 1
      }
      yy += 1
    }
    Yuv(width, height, outY, outU, outV)
  }

  // ------------------------------------------------- loop filter (§15)

  private def loopFilter(yPlane: Array[Int], uPlane: Array[Int], vPlane: Array[Int],
      ypw: Int, cpw: Int, mbW: Int, mbH: Int,
      ymodes: Array[Byte], segments: Array[Byte], hasCoeffs: Array[Boolean],
      skips: Array[Boolean],
      simple: Boolean, baseLevel: Int, sharpness: Int,
      segEnabled: Boolean, segAbs: Boolean, segLf: Array[Int],
      lfDeltaEnabled: Boolean, refLfDeltas: Array[Int], modeLfDeltas: Array[Int]): Unit = {

    @inline def u2s(v: Int): Int = v - 128
    @inline def s2u(v: Int): Int = clamp127(v) + 128

    // common_adjust (§15.2): returns F1, updates p0/q0 through the closure
    def commonAdjust(buf: Array[Int], o: Int, s: Int, useOuter: Boolean): Int = {
      val p1 = u2s(buf(o - 2 * s)); val p0 = u2s(buf(o - s))
      val q0 = u2s(buf(o)); val q1 = u2s(buf(o + s))
      val a = clamp127((if (useOuter) clamp127(p1 - q1) else 0) + 3 * (q0 - p0))
      val f1 = clamp127(a + 4) >> 3
      val f2 = clamp127(a + 3) >> 3
      buf(o) = s2u(q0 - f1)
      buf(o - s) = s2u(p0 + f2)
      f1
    }

    @inline def filterYes(buf: Array[Int], o: Int, s: Int, eLimit: Int, iLimit: Int): Boolean = {
      val p3 = buf(o - 4 * s); val p2 = buf(o - 3 * s); val p1 = buf(o - 2 * s); val p0 = buf(o - s)
      val q0 = buf(o); val q1 = buf(o + s); val q2 = buf(o + 2 * s); val q3 = buf(o + 3 * s)
      (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2) <= eLimit &&
        math.abs(p3 - p2) <= iLimit && math.abs(p2 - p1) <= iLimit &&
        math.abs(p1 - p0) <= iLimit && math.abs(q1 - q0) <= iLimit &&
        math.abs(q2 - q1) <= iLimit && math.abs(q3 - q2) <= iLimit
    }

    @inline def hev(buf: Array[Int], o: Int, s: Int, t: Int): Boolean =
      math.abs(buf(o - 2 * s) - buf(o - s)) > t || math.abs(buf(o + s) - buf(o)) > t

    def mbFilter(buf: Array[Int], o: Int, s: Int, eLimit: Int, iLimit: Int, hevT: Int): Unit = {
      if (filterYes(buf, o, s, eLimit, iLimit)) {
        if (!hev(buf, o, s, hevT)) {
          val p2 = u2s(buf(o - 3 * s)); val p1 = u2s(buf(o - 2 * s)); val p0 = u2s(buf(o - s))
          val q0 = u2s(buf(o)); val q1 = u2s(buf(o + s)); val q2 = u2s(buf(o + 2 * s))
          val w = clamp127(clamp127(p1 - q1) + 3 * (q0 - p0))
          var a = clamp127((27 * w + 63) >> 7)
          buf(o) = s2u(q0 - a); buf(o - s) = s2u(p0 + a)
          a = clamp127((18 * w + 63) >> 7)
          buf(o + s) = s2u(q1 - a); buf(o - 2 * s) = s2u(p1 + a)
          a = clamp127((9 * w + 63) >> 7)
          buf(o + 2 * s) = s2u(q2 - a); buf(o - 3 * s) = s2u(p2 + a)
        } else {
          commonAdjust(buf, o, s, useOuter = true)
        }
      }
    }

    def subFilter(buf: Array[Int], o: Int, s: Int, eLimit: Int, iLimit: Int, hevT: Int): Unit = {
      if (filterYes(buf, o, s, eLimit, iLimit)) {
        val h = hev(buf, o, s, hevT)
        val f1 = commonAdjust(buf, o, s, useOuter = h)
        if (!h) {
          val a = (f1 + 1) >> 1
          buf(o + s) = s2u(u2s(buf(o + s)) - a)
          buf(o - 2 * s) = s2u(u2s(buf(o - 2 * s)) + a)
        }
      }
    }

    def simpleSegment(buf: Array[Int], o: Int, s: Int, eLimit: Int): Unit = {
      if (math.abs(buf(o - s) - buf(o)) * 2 + math.abs(buf(o - 2 * s) - buf(o + s)) / 2 <= eLimit)
        commonAdjust(buf, o, s, useOuter = true)
    }

    var mb = 0
    var mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        // per-MB filter level (§15.1)
        var level =
          if (segEnabled) {
            if (segAbs) segLf(segments(mb)) else baseLevel + segLf(segments(mb))
          } else baseLevel
        if (lfDeltaEnabled) {
          level += refLfDeltas(0) // keyframes are INTRA_FRAME
          if (ymodes(mb) == BPred) level += modeLfDeltas(0)
        }
        if (level < 0) level = 0
        if (level > 63) level = 63
        if (level > 0) {
          var interior = level
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          val mbE = (level + 2) * 2 + interior
          val subE = level * 2 + interior
          val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
          val filterInner = hasCoeffs(mb) || ymodes(mb) == BPred
          val yBase = (mby * 16 + 1) * ypw + (mbx * 16 + 1)
          val cBase = (mby * 8 + 1) * cpw + (mbx * 8 + 1)

          if (simple) {
            // simple filter: luma only
            if (mbx > 0) {
              var r = 0
              while (r < 16) { simpleSegment(yPlane, yBase + r * ypw, 1, mbE); r += 1 }
            }
            if (filterInner) {
              var c = 4
              while (c < 16) {
                var r = 0
                while (r < 16) { simpleSegment(yPlane, yBase + r * ypw + c, 1, subE); r += 1 }
                c += 4
              }
            }
            if (mby > 0) {
              var c = 0
              while (c < 16) { simpleSegment(yPlane, yBase + c, ypw, mbE); c += 1 }
            }
            if (filterInner) {
              var rr = 4
              while (rr < 16) {
                var c = 0
                while (c < 16) { simpleSegment(yPlane, yBase + rr * ypw + c, ypw, subE); c += 1 }
                rr += 4
              }
            }
          } else {
            // normal filter: luma + chroma
            if (mbx > 0) {
              var r = 0
              while (r < 16) { mbFilter(yPlane, yBase + r * ypw, 1, mbE, interior, hevT); r += 1 }
              r = 0
              while (r < 8) {
                mbFilter(uPlane, cBase + r * cpw, 1, mbE, interior, hevT)
                mbFilter(vPlane, cBase + r * cpw, 1, mbE, interior, hevT)
                r += 1
              }
            }
            if (filterInner) {
              var c = 4
              while (c < 16) {
                var r = 0
                while (r < 16) { subFilter(yPlane, yBase + r * ypw + c, 1, subE, interior, hevT); r += 1 }
                c += 4
              }
              var r = 0
              while (r < 8) {
                subFilter(uPlane, cBase + r * cpw + 4, 1, subE, interior, hevT)
                subFilter(vPlane, cBase + r * cpw + 4, 1, subE, interior, hevT)
                r += 1
              }
            }
            if (mby > 0) {
              var c = 0
              while (c < 16) { mbFilter(yPlane, yBase + c, ypw, mbE, interior, hevT); c += 1 }
              c = 0
              while (c < 8) {
                mbFilter(uPlane, cBase + c, cpw, mbE, interior, hevT)
                mbFilter(vPlane, cBase + c, cpw, mbE, interior, hevT)
                c += 1
              }
            }
            if (filterInner) {
              var rr = 4
              while (rr < 16) {
                var c = 0
                while (c < 16) { subFilter(yPlane, yBase + rr * ypw + c, ypw, subE, interior, hevT); c += 1 }
                rr += 4
              }
              var c = 0
              while (c < 8) {
                subFilter(uPlane, cBase + 4 * cpw + c, cpw, subE, interior, hevT)
                subFilter(vPlane, cBase + 4 * cpw + c, cpw, subE, interior, hevT)
                c += 1
              }
            }
          }
        }
        mb += 1
        mbx += 1
      }
      mby += 1
    }
  }

  // ------------------------------------------------- container entry

  /** Decode the 'VP8 ' chunk of a lossy WebP container to YUV planes. */
  def decodeWebpYuv(p: Array[Byte]): Yuv = {
    require(RawWebp.sniff(p), "not a WebP container")
    val (off, len) = RawWebp.findChunk(p, "VP8 ").getOrElse(
      throw new IllegalArgumentException("no VP8 chunk"))
    val frame = java.util.Arrays.copyOfRange(p, off, off + len)
    decode(frame)
  }

  /** Presentation-layer RGB conversion: BT.601 limited-range matrix
    * with nearest-neighbor chroma upsampling. The YUV planes above are
    * the bit-exact normative output (pinned in Vp8Spec); 4:2:0
    * upsampling and the RGB matrix are implementation-defined across
    * decoders — the same adjudicated boundary as RawJpeg's inverse
    * DCT, so RGB output is deterministic here but deliberately NOT
    * conformance-compared against libwebp's fancy upsampler.
    */
  def toRgb(yuv: Yuv): RawImage.Image = {
    val w = yuv.width; val h = yuv.height
    val cw = (w + 1) / 2
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = 298 * ((yuv.y(y * w + x) & 0xff) - 16)
        val d = (yuv.u((y >> 1) * cw + (x >> 1)) & 0xff) - 128
        val e = (yuv.v((y >> 1) * cw + (x >> 1)) & 0xff) - 128
        val o = (y * w + x) * 3
        rgb(o) = clamp255((c + 409 * e + 128) >> 8).toByte
        rgb(o + 1) = clamp255((c - 100 * d - 208 * e + 128) >> 8).toByte
        rgb(o + 2) = clamp255((c + 516 * d + 128) >> 8).toByte
        x += 1
      }
      y += 1
    }
    RawImage.Image(w, h, rgb)
  }
}
