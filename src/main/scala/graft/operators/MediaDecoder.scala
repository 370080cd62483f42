package graft.operators

/** Pluggable codec seam for [[Multimodal]]: everything format-specific —
  * decode, frame extraction, downscaling — lives behind this trait, so a
  * real opencv/ffmpeg binding is a drop-in replacement for [[StubDecoder]]
  * and no operator changes. Implementations are serialized into the
  * `mapPartitions` closures and called once per row from a per-partition
  * loop; a decoder holding native state should allocate it lazily on first
  * call (transient lazy val) so one context is built per partition, never
  * per row, and nothing native rides the closure serialization.
  */
trait MediaDecoder extends Serializable {

  /** Decode one media blob to summary features. `bytes` may be null. */
  def decode(bytes: Array[Byte]): MediaDecoder.Decoded

  /** Split one blob into exactly `nFrames` frame payloads (the video
    * keyframe-sampling contract; payloads may be empty on short input).
    * `bytes` may be null — the operators pass null media through untouched,
    * so every implementation must treat null as an empty payload.
    */
  def frames(bytes: Array[Byte], nFrames: Int): IndexedSeq[Array[Byte]]

  /** Downscale one blob to at most `targetBytes`, returning the new payload
    * and its (width, height) metadata. `bytes` may be null — same contract
    * as [[frames]]: implementations must treat null as an empty payload.
    */
  def resize(bytes: Array[Byte], targetBytes: Int): MediaDecoder.Resized
}

object MediaDecoder {
  final case class Decoded(nBytes: Long, checksum: Long, features: Array[Float])
  final case class Resized(bytes: Array[Byte], width: Int, height: Int)

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual near-dup signature for image pipelines: sample a 9x8
    * nearest-neighbor luma grid, set bit (gy*8+gx) when the right neighbor
    * is brighter. All-integer arithmetic (luma = (299r+587g+114b)/1000,
    * grid position = gx*w/9 floor division), so the hash is bit-identical
    * across engines and SQL-statable for procedurally generated pixels.
    * Returned as (hi, lo) 32-bit halves in two longs — a single 64-bit
    * value would need bit-63 sign gymnastics in portable SQL.
    */
  def dHash64(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val lum = Array.ofDim[Int](8, 9)
    var gy = 0
    while (gy < 8) {
      val sy = gy * h / 8
      var gx = 0
      while (gx < 9) {
        val sx = gx * w / 9
        val p = img.getRGB(sx, sy)
        val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
        lum(gy)(gx) = (299 * r + 587 * g + 114 * b) / 1000
        gx += 1
      }
      gy += 1
    }
    var hi = 0L; var lo = 0L
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (lum(gy)(gx + 1) > lum(gy)(gx)) {
          val k = gy * 8 + gx
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        gx += 1
      }
      gy += 1
    }
    (hi, lo)
  }

  /** Rolling checksum shared by the stub paths (and usable by any decoder
    * that wants a cheap content id).
    */
  def checksum(bytes: Array[Byte]): Long = {
    var ck = 7L
    var i = 0
    while (i < bytes.length) {
      ck = (ck * 31 + (bytes(i) & 0xFF)) % 2147483647L
      i += 1
    }
    ck
  }
}

/** Default decoder: deterministic fake features from the raw bytes (this
  * environment ships no codec libraries). Byte count + rolling checksum +
  * 8-bin byte histogram for decode; equal byte chunks for frames; stride
  * subsampling for resize. Every output is a pure function of the input
  * bytes, so results are identical across partitionings, retries and
  * engines — which is what lets the m01–m03 gate rows be spec-pinned.
  */
object StubDecoder extends MediaDecoder {

  override def decode(bytes: Array[Byte]): MediaDecoder.Decoded = {
    if (bytes == null) return MediaDecoder.Decoded(0L, 0L, new Array[Float](8))
    var checksum = 7L
    val hist = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      checksum = (checksum * 31 + b) % 2147483647L
      hist(b >> 5) += 1f
      i += 1
    }
    MediaDecoder.Decoded(bytes.length.toLong, checksum, hist)
  }

  override def frames(bytes: Array[Byte], nFrames: Int): IndexedSeq[Array[Byte]] = {
    val in = if (bytes == null) Array.emptyByteArray else bytes
    val step = math.max(1, in.length / nFrames)
    (0 until nFrames).map { f =>
      val from = math.min(f * step, in.length)
      val until = if (f == nFrames - 1) in.length else math.min(from + step, in.length)
      java.util.Arrays.copyOfRange(in, from, until)
    }
  }

  override def resize(bytes: Array[Byte], targetBytes: Int): MediaDecoder.Resized = {
    val in = if (bytes == null) Array.emptyByteArray else bytes
    val out =
      if (in.length <= targetBytes) in
      else {
        val step = in.length.toDouble / targetBytes
        Array.tabulate(targetBytes)(i => in((i * step).toInt))
      }
    val side = math.sqrt(out.length.toDouble).toInt
    MediaDecoder.Resized(out, side, side)
  }
}

/** Dispatching default decoder: sniff each payload's container magic bytes
  * and route the row to the real pure-JDK decoder for that format —
  * PNG / JPEG / GIF / BMP → [[ImageIoDecoder]] (GIF includes the animated
  * frames path), RIFF/WAVE / FORM/AIFF / .snd AU → [[AudioWavDecoder]] —
  * and anything unrecognized (true video containers, text, null/empty or
  * truncated payloads) to [[StubDecoder]]. Routing is per ROW, so one
  * mixed-modality `binary` column decodes each payload with the right
  * codec without the caller pre-splitting by mime; the real decoders keep
  * their own internal stub fallback, so a sniffed-but-corrupt payload
  * still degrades to deterministic stub output rather than failing the
  * task. Stateless (all three targets are JDK-static), so serialization
  * into the `mapPartitions` closures is free.
  */
object SniffingDecoder extends MediaDecoder {

  /** Longest magic we check is bytes [8,12) of a RIFF/FORM container. */
  private[operators] def sniff(bytes: Array[Byte]): MediaDecoder =
    if (bytes == null || bytes.length < 4) StubDecoder
    else {
      def at(i: Int): Int = bytes(i) & 0xFF
      val image =
        (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') || // PNG
          (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) ||             // JPEG SOI
          (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') || // GIF87a/89a
          (at(0) == 'B' && at(1) == 'M')                                   // BMP
      val audio = bytes.length >= 12 && (
        (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
          at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') || // WAV
          (at(0) == 'F' && at(1) == 'O' && at(2) == 'R' && at(3) == 'M' &&
            at(8) == 'A' && at(9) == 'I' && at(10) == 'F') ||                // AIFF/AIFC
          (at(0) == '.' && at(1) == 's' && at(2) == 'n' && at(3) == 'd'))    // AU
      if (image) ImageIoDecoder
      else if (AviMjpeg.sniff(bytes)) AviMjpegDecoder // RIFF/AVI (MJPEG video)
      else if (audio) AudioWavDecoder
      else StubDecoder
    }

  override def decode(bytes: Array[Byte]): MediaDecoder.Decoded =
    sniff(bytes).decode(bytes)

  override def frames(bytes: Array[Byte], nFrames: Int): IndexedSeq[Array[Byte]] =
    sniff(bytes).frames(bytes, nFrames)

  override def resize(bytes: Array[Byte], targetBytes: Int): MediaDecoder.Resized =
    sniff(bytes).resize(bytes, targetBytes)
}

/** Real STILL-IMAGE decoder over the pure-JDK `javax.imageio` readers —
  * PNG/JPEG/GIF/BMP decode with no native codec libraries (the reason the
  * rest of multimodal stays stubbed in this sandbox doesn't apply to
  * images: the JDK ships these readers). Per operation:
  *
  *  - `decode`: real (width, height, per-channel means, luma min/max/std)
  *    from the decoded pixels — 8 floats, same arity as the stub's
  *    histogram so downstream schemas don't fork on decoder choice;
  *  - `resize`: real nearest-neighbor downscale re-encoded as PNG. The
  *    sampling loop is hand-rolled (`out(x,y) = in(x·sw/w, y·sh/h)`)
  *    rather than Graphics2D because the rendering pipeline's output is
  *    implementation-defined, and resize feeds checksum-pinned gate rows;
  *  - `frames`: REAL temporal sampling for multi-frame image streams —
  *    the JDK's GIF reader exposes every stored frame of an animated GIF
  *    (`reader.getNumImages`), so `nFrames` indices are sampled evenly
  *    across the k stored frames (`f·k/n`, the keyframe-sampling rule)
  *    and each decoded frame is re-encoded as PNG. A single still yields
  *    the still n times. Stored frames are returned as stored — no
  *    GIF disposal-method compositing (our use is frame features, not
  *    playback). True video containers (mp4 etc.) have no JDK reader and
  *    fall back to [[StubDecoder]]'s byte chunking.
  *
  * Bytes no installed ImageReader accepts (video payloads, text, null or
  * empty arrays, truncated files) fall back to [[StubDecoder]] for the
  * matching operation, so one decoder instance handles a mixed-media
  * column without per-row dispatch by the caller.
  *
  * All streams are memory-cached (`MemoryCacheImageInputStream`) — the
  * `ImageIO.read(InputStream)` convenience would otherwise spill every
  * blob through a temp FILE on executors (ImageIO's default disk cache),
  * and flipping the global `ImageIO.setUseCache(false)` from library code
  * would mutate JVM-wide state the host application may rely on.
  * ImageIO's reader registry is JDK-static, so there is no per-partition
  * decoder state to initialize — calls are pure CPU.
  */
object ImageIoDecoder extends MediaDecoder {

  private[operators] def read(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream itself on the
      // normal path; the belt-and-braces close covers the exception path
      // and must swallow the resulting double-close IOException
      try Option(javax.imageio.ImageIO.read(iis))
      catch { case _: java.io.IOException | _: RuntimeException => None }
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    }

  private[operators] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { javax.imageio.ImageIO.write(img, "png", ios); ios.flush() }
    finally ios.close()
    bos.toByteArray
  }

  private def scaleNearest(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth; val sh = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h))
        x += 1
      }
      y += 1
    }
    out
  }

  override def decode(bytes: Array[Byte]): MediaDecoder.Decoded = read(bytes) match {
    case None => StubDecoder.decode(bytes)
    case Some(img) =>
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var minL = 255.0; var maxL = 0.0; var sumL = 0.0; var sumL2 = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          sr += r; sg += g; sb += b
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          if (l < minL) minL = l
          if (l > maxL) maxL = l
          sumL += l; sumL2 += l * l
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      val varL = math.max(0.0, sumL2 / n - (sumL / n) * (sumL / n))
      MediaDecoder.Decoded(bytes.length.toLong, MediaDecoder.checksum(bytes),
        Array(w.toFloat, h.toFloat, (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
          minL.toFloat, maxL.toFloat, math.sqrt(varL).toFloat))
  }

  override def frames(bytes: Array[Byte], nFrames: Int): IndexedSeq[Array[Byte]] = {
    if (bytes == null || bytes.length == 0) return StubDecoder.frames(bytes, nFrames)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return StubDecoder.frames(bytes, nFrames)
      val reader = readers.next()
      reader.setInput(iis)
      try {
        // allowSearch=true: count frames even when the stream isn't
        // seekable-indexed (the GIF reader scans once and caches)
        val k = reader.getNumImages(true)
        if (k <= 0) StubDecoder.frames(bytes, nFrames)
        else (0 until nFrames).map(f => encodePng(reader.read(f * k / nFrames)))
      } finally reader.dispose()
    } catch {
      case _: java.io.IOException | _: RuntimeException =>
        StubDecoder.frames(bytes, nFrames)
    } finally {
      try iis.close() catch { case _: java.io.IOException => () }
    }
  }

  override def resize(bytes: Array[Byte], targetBytes: Int): MediaDecoder.Resized = read(bytes) match {
    case None => StubDecoder.resize(bytes, targetBytes)
    case Some(img) =>
      if (bytes.length <= targetBytes)
        MediaDecoder.Resized(bytes, img.getWidth, img.getHeight)
      else {
        // shrink area by the byte ratio first, then halve until the PNG
        // fits: bounded loop (dims at least halve per miss, floor 1×1 — a
        // 1×1 PNG is ~70 bytes of container overhead, the format's honest
        // lower bound, returned even if targetBytes asks for less)
        val f = math.sqrt(targetBytes.toDouble / bytes.length)
        var w = math.max(1, math.round(img.getWidth * f).toInt)
        var h = math.max(1, math.round(img.getHeight * f).toInt)
        var out = encodePng(scaleNearest(img, w, h))
        while (out.length > targetBytes && (w > 1 || h > 1)) {
          w = math.max(1, w / 2); h = math.max(1, h / 2)
          out = encodePng(scaleNearest(img, w, h))
        }
        MediaDecoder.Resized(out, w, h)
      }
  }
}
