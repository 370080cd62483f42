package graft.operators

/** MJPEG-in-AVI: REAL video decode with zero native dependencies — the one
  * video container a pure JDK can both write and read, because the
  * container layer is just RIFF chunk framing (hand-parsed here, ~no spec
  * surface beyond fourcc + little-endian sizes) and every frame payload is
  * a plain JPEG the JDK's ImageIO decodes. mp4/H.264-class codecs need
  * native libraries this environment doesn't ship — those payloads still
  * fall back to [[StubDecoder]] — but motion-JPEG AVI closes the "video is
  * only stubbed" gap with an honest end-to-end path: container demux →
  * per-frame JPEG decode → temporal sampling / downscale → container
  * re-mux.
  */
object AviMjpeg {

  /** Parsed MJPEG AVI: header facts + the stored frame payloads (JPEGs). */
  final case class Parsed(
      width: Int, height: Int, usPerFrame: Int, frames: IndexedSeq[Array[Byte]])

  private def u32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xFF).toInt); b.write(((v >> 8) & 0xFF).toInt)
    b.write(((v >> 16) & 0xFF).toInt); b.write(((v >> 24) & 0xFF).toInt)
  }
  private def u16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
  }
  private def fourcc(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    fourcc(b, id); u32(b, payload.length.toLong)
    b.write(payload)
    if (payload.length % 2 == 1) b.write(0) // RIFF chunks pad to even
    b.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    fourcc(b, "LIST"); u32(b, (body.length + 4).toLong); fourcc(b, listType)
    b.write(body)
    b.toByteArray
  }

  /** Write a structurally valid single-stream MJPEG AVI. */
  def write(width: Int, height: Int, fps: Int, jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && jpegFrames.nonEmpty)
    val n = jpegFrames.length
    val avih = {
      val b = new java.io.ByteArrayOutputStream()
      u32(b, 1000000L / fps); u32(b, 0L); u32(b, 0L); u32(b, 0L)
      u32(b, n.toLong); u32(b, 0L); u32(b, 1L); u32(b, 0L)
      u32(b, width.toLong); u32(b, height.toLong)
      (0 until 4).foreach(_ => u32(b, 0L))
      b.toByteArray
    }
    val strh = {
      val b = new java.io.ByteArrayOutputStream()
      fourcc(b, "vids"); fourcc(b, "MJPG")
      u32(b, 0L); u16(b, 0); u16(b, 0); u32(b, 0L)
      u32(b, 1L); u32(b, fps.toLong) // scale=1, rate=fps
      u32(b, 0L); u32(b, n.toLong); u32(b, 0L); u32(b, 0L); u32(b, 0L)
      u16(b, 0); u16(b, 0); u16(b, width); u16(b, height) // rcFrame
      b.toByteArray
    }
    val strf = {
      val b = new java.io.ByteArrayOutputStream()
      u32(b, 40L); u32(b, width.toLong); u32(b, height.toLong)
      u16(b, 1); u16(b, 24); fourcc(b, "MJPG")
      u32(b, width.toLong * height * 3); u32(b, 0L); u32(b, 0L); u32(b, 0L); u32(b, 0L)
      b.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = hdrl ++ movi
    val out = new java.io.ByteArrayOutputStream()
    fourcc(out, "RIFF"); u32(out, (body.length + 4).toLong); fourcc(out, "AVI ")
    out.write(body)
    out.toByteArray
  }

  private def ru32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) | ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** True for any RIFF/AVI payload (how [[SniffingDecoder]] routes here). */
  def sniff(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && cc(bytes, 0) == "RIFF" && cc(bytes, 8) == "AVI "

  /** Parse; None for anything that is not a well-formed MJPEG AVI (the
    * decoder then falls back to the stub, like every other codec here).
    */
  def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (!sniff(bytes)) return None
    try {
      var width = 0; var height = 0; var usPerFrame = 0
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      // walk(from, until): iterate sibling chunks in [from, until)
      def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
        var o = from
        while (o + 8 <= until) {
          val id = cc(bytes, o)
          val size = ru32(bytes, o + 4).toInt
          if (size < 0 || o + 8 + size > until) throw new IllegalArgumentException("bad chunk")
          if (id == "LIST" && size >= 4) {
            val lt = cc(bytes, o + 8)
            walk(o + 12, o + 8 + size, inMovi = lt == "movi")
          } else if (id == "avih" && size >= 40) {
            usPerFrame = ru32(bytes, o + 8).toInt
            width = ru32(bytes, o + 8 + 32).toInt
            height = ru32(bytes, o + 8 + 36).toInt
          } else if (inMovi && (id == "00dc" || id == "00db")) {
            frames += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + size)
          }
          o += 8 + size + (size % 2) // chunks pad to even
        }
      }
      walk(12, bytes.length, inMovi = false)
      val fs = frames.result()
      if (width <= 0 || height <= 0 || fs.isEmpty) None
      else Some(Parsed(width, height, usPerFrame, fs))
    } catch { case _: RuntimeException => None }
  }
}

/** Real MJPEG-AVI video decoder (see [[AviMjpeg]]). Per operation:
  *
  *  - `decode`: container + signal facts, 8 floats like every decoder:
  *    `[width, height, nFrames, fps, firstFrameMeanLuma, lastFrameMeanLuma,
  *    meanJpegBytesPerFrame, usPerFrame]` — dims and frame count are exact
  *    header facts (what the m08 oracle pins closed-form); lumas come from
  *    really JPEG-decoding the first/last frames;
  *  - `frames`: REAL temporal sampling — stored frame `f·k/n` of the k
  *    stored JPEGs, each decoded and re-encoded PNG (the m06 GIF rule,
  *    applied to a true video container);
  *  - `resize`: downscale every frame (nearest-neighbor, the m05 kernel),
  *    re-encode JPEG, re-mux the AVI; dims halve until the container fits
  *    `targetBytes` (floor 1×1). Reported meta = the new (width, height).
  *
  * Undecodable/null/truncated payloads fall back to [[StubDecoder]], same
  * mixed-column posture as the image and audio decoders.
  */
object AviMjpegDecoder extends MediaDecoder {

  private def decodeJpeg(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try Option(javax.imageio.ImageIO.read(iis))
    catch { case _: java.io.IOException | _: RuntimeException => None }
    finally { try iis.close() catch { case _: java.io.IOException => () } }
  }

  private[operators] def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { javax.imageio.ImageIO.write(img, "jpeg", ios); ios.flush() }
    finally ios.close()
    bos.toByteArray
  }

  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sum += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
        x += 1
      }
      y += 1
    }
    sum / (w.toDouble * h)
  }

  override def decode(bytes: Array[Byte]): MediaDecoder.Decoded = AviMjpeg.parse(bytes) match {
    case None => StubDecoder.decode(bytes)
    case Some(p) =>
      val fps = if (p.usPerFrame > 0) 1e6 / p.usPerFrame else 0.0
      val first = decodeJpeg(p.frames.head).map(meanLuma).getOrElse(-1.0)
      val last = decodeJpeg(p.frames.last).map(meanLuma).getOrElse(-1.0)
      val avgBytes = p.frames.map(_.length.toLong).sum.toDouble / p.frames.length
      MediaDecoder.Decoded(bytes.length.toLong, MediaDecoder.checksum(bytes),
        Array(p.width.toFloat, p.height.toFloat, p.frames.length.toFloat, fps.toFloat,
          first.toFloat, last.toFloat, avgBytes.toFloat, p.usPerFrame.toFloat))
  }

  override def frames(bytes: Array[Byte], nFrames: Int): IndexedSeq[Array[Byte]] =
    AviMjpeg.parse(bytes) match {
      case None => StubDecoder.frames(bytes, nFrames)
      case Some(p) =>
        val k = p.frames.length
        (0 until nFrames).map { f =>
          decodeJpeg(p.frames(f * k / nFrames)) match {
            case Some(img) => ImageIoDecoder.encodePng(img)
            case None => Array.emptyByteArray
          }
        }
    }

  override def resize(bytes: Array[Byte], targetBytes: Int): MediaDecoder.Resized =
    AviMjpeg.parse(bytes) match {
      case None => StubDecoder.resize(bytes, targetBytes)
      case Some(p) =>
        if (bytes.length <= targetBytes) MediaDecoder.Resized(bytes, p.width, p.height)
        else {
          val imgs = p.frames.flatMap(decodeJpeg)
          if (imgs.length != p.frames.length) return StubDecoder.resize(bytes, targetBytes)
          def remux(w: Int, h: Int): Array[Byte] = {
            val fps = if (p.usPerFrame > 0) (1e6 / p.usPerFrame).round.toInt.max(1) else 1
            AviMjpeg.write(w, h, fps, imgs.map(i => encodeJpeg(scaleNearest(i, w, h))))
          }
          val f = math.sqrt(targetBytes.toDouble / bytes.length)
          var w = math.max(1, math.round(p.width * f).toInt)
          var h = math.max(1, math.round(p.height * f).toInt)
          var out = remux(w, h)
          while (out.length > targetBytes && (w > 1 || h > 1)) {
            w = math.max(1, w / 2); h = math.max(1, h / 2)
            out = remux(w, h)
          }
          MediaDecoder.Resized(out, w, h)
        }
    }

  private def scaleNearest(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth; val sh = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h)); x += 1 }
      y += 1
    }
    out
  }
}
