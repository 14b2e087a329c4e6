package graft.operators

/** Pure-JVM video codec for YUV4MPEG2 (.y4m): the standard UNCOMPRESSED
  * video interchange format — an ASCII stream header, then per-frame
  * "FRAME\n" markers followed by raw planar YCbCr — so the multimodal
  * pipeline decodes video for real as well (the moving-picture twin of
  * [[RawImage]]/[[RawAudio]]). Compressed video (H.264/VP9/...) stays
  * behind the stub boundary.
  *
  * Supported: C420 (default) and C444 chroma; interlacing/aspect tags
  * are parsed and ignored.
  */
object RawVideo {

  /** One decoded frame: the luma plane only (what sampling/filtering
    * pipelines read first; chroma offsets are tracked but not stored).
    */
  final case class Frame(index: Int, luma: Array[Byte])

  final case class Video(width: Int, height: Int, fpsNum: Int,
      fpsDen: Int, chroma: String, frames: Vector[Frame])

  private val magic = "YUV4MPEG2"

  def sniff(p: Array[Byte]): String =
    if (p.length >= magic.length &&
      new String(p, 0, magic.length, "US-ASCII") == magic) "video/y4m"
    else "unknown"

  private def frameBytes(w: Int, h: Int, chroma: String): Int =
    chroma match {
      case "C420" | "C420jpeg" | "C420paldv" | "C420mpeg2" =>
        w * h + 2 * ((w + 1) / 2) * ((h + 1) / 2)
      case "C444" => w * h * 3
      case other => throw new IllegalArgumentException(
        s"unsupported chroma $other")
    }

  /** Stream header: "YUV4MPEG2 W<w> H<h> F<num>:<den> [Ix Ax Cxxx]\n";
    * every frame: "FRAME[params]\n" + planes.
    */
  def decodeY4m(p: Array[Byte]): Video = {
    require(sniff(p) == "video/y4m", "not a y4m stream")
    var i = magic.length
    var w = 0; var h = 0; var fn = 25; var fd = 1; var chroma = "C420"
    // stream-header tags up to newline
    while (i < p.length && p(i) != '\n') {
      if (p(i) == ' ') {
        i += 1
        val start = i
        while (i < p.length && p(i) != ' ' && p(i) != '\n') i += 1
        val tag = new String(p, start, i - start, "US-ASCII")
        tag.headOption match {
          case Some('W') => w = tag.tail.toInt
          case Some('H') => h = tag.tail.toInt
          case Some('F') =>
            val Array(a, b) = tag.tail.split(":"); fn = a.toInt; fd = b.toInt
          case Some('C') => chroma = tag
          case _ => () // Ip/At/X... — parsed, ignored
        }
      } else i += 1
    }
    i += 1 // past header newline
    require(w > 0 && h > 0, "missing W/H in y4m header")
    val fb = frameBytes(w, h, chroma)
    val frames = Vector.newBuilder[Frame]
    var idx = 0
    while (i < p.length) {
      require(i + 5 <= p.length &&
        new String(p, i, 5, "US-ASCII") == "FRAME", s"bad frame marker at $i")
      i += 5
      while (i < p.length && p(i) != '\n') i += 1 // frame params
      i += 1
      frames += Frame(idx, java.util.Arrays.copyOfRange(p, i, i + w * h))
      i += fb
      idx += 1
    }
    Video(w, h, fn, fd, chroma, frames.result())
  }

  /** Encode C420 with neutral (128) chroma planes. */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      lumas: Seq[Array[Byte]]): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420\n"
        .getBytes("US-ASCII")
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    val fb = width * height + 2 * cw * ch
    val out = new java.io.ByteArrayOutputStream(
      header.length + lumas.size * (6 + fb))
    out.write(header)
    val chroma = Array.fill((2 * cw * ch))(128.toByte)
    lumas.foreach { l =>
      require(l.length == width * height, "bad luma plane size")
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(l)
      out.write(chroma)
    }
    out.toByteArray
  }

  /** Exact per-frame luma sum (one division away from the mean). */
  def lumaSum(f: Frame): Long = {
    var s = 0L
    var i = 0
    while (i < f.luma.length) { s += f.luma(i) & 0xff; i += 1 }
    s
  }

  /** Sum of absolute luma differences against the previous frame — the
    * classic SAD motion metric (scene-cut / static-clip detection in a
    * video-curation pipeline). One (frame_idx, sad) pair per frame
    * after the first; exact integers.
    */
  def frameSad(v: Video): Seq[(Int, Long)] =
    v.frames.sliding(2).collect { case Seq(prev, cur) =>
      var sad = 0L
      var i = 0
      while (i < cur.luma.length) {
        sad += math.abs((cur.luma(i) & 0xff) - (prev.luma(i) & 0xff))
        i += 1
      }
      (cur.index, sad)
    }.toSeq
}
