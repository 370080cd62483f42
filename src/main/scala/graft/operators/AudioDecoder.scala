package graft.operators

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
    else {
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

  private def encodeWav(p: Pcm, data: Array[Byte], format: javax.sound.sampled.AudioFormat): Array[Byte] = {
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
