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
    */
  def frames(bytes: Array[Byte], nFrames: Int): IndexedSeq[Array[Byte]]

  /** Downscale one blob to at most `targetBytes`, returning the new payload
    * and its (width, height) metadata.
    */
  def resize(bytes: Array[Byte], targetBytes: Int): MediaDecoder.Resized
}

object MediaDecoder {
  final case class Decoded(nBytes: Long, checksum: Long, features: Array[Float])
  final case class Resized(bytes: Array[Byte], width: Int, height: Int)

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
