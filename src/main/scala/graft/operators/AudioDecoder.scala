package graft.operators

/** Lock-free RIFF/WAVE codec — byte-identical to the JDK's WAV writer for
  * integer little-endian PCM, with NO shared state. It exists because every
  * `AudioSystem.getAudioInputStream` / `AudioSystem.write` call routes
  * through a synchronized static SPI provider lookup
  * (`JDK13Services.getProviders`), which turns a 32-thread decode fan-out
  * into a lock convoy: measured on this container, decoding 12k in-memory
  * WAV clips takes 146 ms on ONE thread but 409 ms wall on THIRTY-TWO —
  * the exact mechanism behind m07's r9 bench regression (0.73 → 3.18 s)
  * after media generation was spread across partitions. Direct byte-level
  * parse/serialize touches nothing global, so per-partition codec work
  * scales with cores — on an executor with any core count.
  */
private[operators] object RiffWav {

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Parse a RIFF/WAVE container holding plain integer PCM (format code 1,
    * ≤ 16-bit). Returns `(format, pcmData)` or None when the bytes are not
    * such a WAV — the caller falls back to the JDK readers for AIFF/AU and
    * exotic WAV flavors (float PCM, extensible, compressed).
    */
  def parse(bytes: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] = {
    if (bytes == null || bytes.length < 44 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    var off = 12
    var fmt: javax.sound.sampled.AudioFormat = null
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length && (fmt == null || data == null)) {
      val size = le32(bytes, off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      val isFmt = bytes(off) == 'f' && bytes(off + 1) == 'm' &&
        bytes(off + 2) == 't' && bytes(off + 3) == ' '
      val isData = bytes(off) == 'd' && bytes(off + 1) == 'a' &&
        bytes(off + 2) == 't' && bytes(off + 3) == 'a'
      if (isFmt) {
        if (size < 16) return None
        val code = le16(bytes, off + 8)
        val channels = le16(bytes, off + 10)
        val rate = le32(bytes, off + 12)
        val block = le16(bytes, off + 20)
        val bits = le16(bytes, off + 22)
        if (code != 1 || bits > 16 || bits < 1 || channels < 1 || block < 1) return None
        // WAV spec: 8-bit PCM is unsigned, 9..16-bit is signed little-endian
        val enc =
          if (bits <= 8) javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          else javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        fmt = new javax.sound.sampled.AudioFormat(enc, rate.toFloat, bits, channels,
          block, rate.toFloat, false)
      } else if (isData) {
        data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmt == null || data == null) None else Some((fmt, data))
  }

  /** True when [[write]] can serialize this format directly (the only
    * formats this library ever re-encodes): plain integer little-endian
    * PCM, ≤ 16-bit.
    */
  def canWrite(fmt: javax.sound.sampled.AudioFormat): Boolean = {
    val enc = fmt.getEncoding
    (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
      enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) &&
      fmt.getSampleSizeInBits <= 16 && !fmt.isBigEndian && fmt.getFrameSize > 0
  }

  /** Serialize PCM data as a canonical 44-byte-header WAV — byte-identical
    * to `AudioSystem.write(..., Type.WAVE, ...)` for the formats
    * [[canWrite]] accepts.
    */
  def write(fmt: javax.sound.sampled.AudioFormat, data: Array[Byte]): Array[Byte] = {
    require(canWrite(fmt), s"RiffWav.write: unsupported format $fmt")
    val block = fmt.getFrameSize
    val rate = fmt.getSampleRate.toInt
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('R'.toByte).put('I'.toByte).put('F'.toByte).put('F'.toByte)
      .putInt(36 + data.length)
      .put('W'.toByte).put('A'.toByte).put('V'.toByte).put('E'.toByte)
      .put('f'.toByte).put('m'.toByte).put('t'.toByte).put(' '.toByte)
      .putInt(16)
      .putShort(1)
      .putShort(fmt.getChannels.toShort)
      .putInt(rate)
      .putInt(rate * block)
      .putShort(block.toShort)
      .putShort(fmt.getSampleSizeInBits.toShort)
      .put('d'.toByte).put('a'.toByte).put('t'.toByte).put('a'.toByte)
      .putInt(data.length)
      .put(data)
    bb.array()
  }
}

/** Real AUDIO decoder over the pure-JDK `javax.sound.sampled` readers —
  * WAV/AIFF/AU decode with no native codec libraries, the audio sibling of
  * [[ImageIoDecoder]]. Per operation:
  *
  *  - `decode`: real signal features from the PCM samples — 8 floats,
  *    same arity as the other decoders so downstream schemas don't fork:
  *    `[sampleRate, channels, frames, durationMs, rms, peak, zeroCross,
  *    meanAbs]` (amplitudes normalized to [-1, 1], mixed down to mono for
  *    the signal stats, accumulated in declaration order so results are
  *    bit-stable);
  *  - `frames`: REAL temporal sampling — the PCM stream is cut into
  *    `nFrames` contiguous equal-duration segments, each re-encoded as a
  *    standalone WAV (header + its slice), the audio analogue of
  *    keyframe sampling. The last segment absorbs the remainder;
  *  - `resize`: sample-rate DECIMATION — keep every k-th PCM frame with
  *    the smallest k whose WAV re-encode fits `targetBytes`, re-encoded
  *    at `sampleRate/k` so playback speed is preserved. The reported
  *    metadata reuses the (width, height) slots as
  *    (decimated sample rate, channels) — the honest audio reading of an
  *    image-shaped contract, documented here rather than widening the
  *    seam for one modality.
  *
  * Only integer-PCM encodings up to 16-bit are decoded (the formats the
  * JDK writes natively); anything else — compressed audio, float PCM,
  * images, text, null/empty payloads — falls back to [[StubDecoder]] for
  * the matching operation, same mixed-column posture as the image
  * decoder. All parsing is in-memory; `AudioSystem` readers are
  * JDK-static, so there is no per-partition state.
  */
object AudioWavDecoder extends MediaDecoder {

  private final case class Pcm(
      format: javax.sound.sampled.AudioFormat,
      bytes: Array[Byte],
      frames: Int)

  private def read(bytes: Array[Byte]): Option[Pcm] =
    if (bytes == null || bytes.length == 0) None
    else RiffWav.parse(bytes) match {
      // hot path: direct lock-free RIFF parse (see [[RiffWav]]) — no
      // synchronized AudioSystem SPI lookup per row
      case Some((fmt, data)) => Some(Pcm(fmt, data, data.length / fmt.getFrameSize))
      case None => readViaJdk(bytes)
    }

  /** Cold fallback for the containers [[RiffWav]] doesn't speak (AIFF, AU,
    * float/extensible WAV) — routes through the synchronized AudioSystem
    * SPI, acceptable off the hot path.
    */
  private def readViaJdk(bytes: Array[Byte]): Option[Pcm] =
    {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val intPcm = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (!intPcm || fmt.getSampleSizeInBits > 16 || fmt.getFrameSize <= 0) None
          else {
            val data = in.readAllBytes()
            Some(Pcm(fmt, data, data.length / fmt.getFrameSize))
          }
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }

  /** Sample `s` of channel `c` in frame `f`, normalized to [-1, 1]. */
  private def sampleAt(p: Pcm, f: Int, c: Int): Double = {
    val bits = p.format.getSampleSizeInBits
    val bytesPer = (bits + 7) / 8
    val off = f * p.format.getFrameSize + c * bytesPer
    if (bytesPer == 1) {
      if (p.format.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
        ((p.bytes(off) & 0xFF) - 128) / 128.0
      else p.bytes(off) / 128.0
    } else {
      val lo = p.bytes(off + (if (p.format.isBigEndian) 1 else 0)) & 0xFF
      val hi = p.bytes(off + (if (p.format.isBigEndian) 0 else 1))
      val v = (hi << 8) | lo
      (if (p.format.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
        (v & 0xFFFF) - 32768
      else v) / 32768.0
    }
  }

  private def encodeWav(p: Pcm, data: Array[Byte], format: javax.sound.sampled.AudioFormat): Array[Byte] =
    if (RiffWav.canWrite(format)) RiffWav.write(format, data) // lock-free hot path
    else {
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), format, data.length.toLong / format.getFrameSize)
      val bos = new java.io.ByteArrayOutputStream()
      try javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      finally stream.close()
      bos.toByteArray
    }

  /** Channel-0 RAW integer sample values (16-bit: [-32768, 32767]; 8-bit:
    * [-128, 127] after the unsigned recenter) — the bit-exact feed for
    * integer DSP like [[Multimodal.audioFingerprint]], where the
    * normalized-double path would cost cross-engine parity. Null when the
    * payload isn't decodable integer PCM.
    */
  private[operators] def rawSamples(bytes: Array[Byte]): Array[Int] = read(bytes) match {
    case None => null
    case Some(p) =>
      val bits = p.format.getSampleSizeInBits
      val out = new Array[Int](p.frames)
      var f = 0
      while (f < p.frames) {
        val off = f * p.format.getFrameSize
        out(f) =
          if (bits <= 8) {
            if (p.format.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
              (p.bytes(off) & 0xFF) - 128
            else p.bytes(off).toInt
          } else {
            val lo = p.bytes(off + (if (p.format.isBigEndian) 1 else 0)) & 0xFF
            val hi = p.bytes(off + (if (p.format.isBigEndian) 0 else 1))
            val v = (hi << 8) | lo
            if (p.format.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
              (v & 0xFFFF) - 32768
            else v
          }
        f += 1
      }
      out
  }

  override def decode(bytes: Array[Byte]): MediaDecoder.Decoded = read(bytes) match {
    case None => StubDecoder.decode(bytes)
    case Some(p) =>
      val ch = p.format.getChannels
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
      var zeroCross = 0L
      var prevSign = 0
      var f = 0
      while (f < p.frames) {
        // mix down to mono for the signal stats
        var s = 0.0
        var c = 0
        while (c < ch) { s += sampleAt(p, f, c); c += 1 }
        s /= ch
        sumSq += s * s
        val a = math.abs(s)
        sumAbs += a
        if (a > peak) peak = a
        val sign = if (s > 0) 1 else if (s < 0) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) zeroCross += 1
        if (sign != 0) prevSign = sign
        f += 1
      }
      val n = math.max(1, p.frames).toDouble
      val durationMs = p.frames * 1000.0 / p.format.getSampleRate
      MediaDecoder.Decoded(bytes.length.toLong, MediaDecoder.checksum(bytes),
        Array(p.format.getSampleRate, ch.toFloat, p.frames.toFloat, durationMs.toFloat,
          math.sqrt(sumSq / n).toFloat, peak.toFloat, zeroCross.toFloat,
          (sumAbs / n).toFloat))
  }

  override def frames(bytes: Array[Byte], nFrames: Int): IndexedSeq[Array[Byte]] = read(bytes) match {
    case None => StubDecoder.frames(bytes, nFrames)
    case Some(p) =>
      val fs = p.format.getFrameSize
      val per = p.frames / nFrames
      (0 until nFrames).map { i =>
        val from = i * per
        val until = if (i == nFrames - 1) p.frames else (i + 1) * per
        encodeWav(p, java.util.Arrays.copyOfRange(p.bytes, from * fs, until * fs), p.format)
      }
  }

  override def resize(bytes: Array[Byte], targetBytes: Int): MediaDecoder.Resized = read(bytes) match {
    case None => StubDecoder.resize(bytes, targetBytes)
    case Some(p) =>
      if (bytes.length <= targetBytes)
        MediaDecoder.Resized(bytes, p.format.getSampleRate.toInt, p.format.getChannels)
      else {
        val fs = p.format.getFrameSize
        // smallest decimation factor whose payload fits under target once
        // the ~44-byte WAV header is set aside; bounded by frame count
        var k = math.max(1, math.ceil(p.frames.toDouble * fs / math.max(1, targetBytes - 64)).toInt)
        var out: Array[Byte] = null
        var kept = 0
        var fmt: javax.sound.sampled.AudioFormat = null
        while (out == null || (out.length > targetBytes && kept > 1)) {
          kept = (p.frames + k - 1) / k
          val data = new Array[Byte](kept * fs)
          var i = 0
          while (i < kept) {
            System.arraycopy(p.bytes, i * k * fs, data, i * fs, fs)
            i += 1
          }
          fmt = new javax.sound.sampled.AudioFormat(p.format.getEncoding,
            p.format.getSampleRate / k, p.format.getSampleSizeInBits,
            p.format.getChannels, fs, p.format.getFrameRate / k, p.format.isBigEndian)
          out = encodeWav(p, data, fmt)
          k *= 2
        }
        MediaDecoder.Resized(out, fmt.getSampleRate.toInt, p.format.getChannels)
      }
  }
}
