package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star scope): media as opaque `binary`
  * columns plus a typed metadata struct, with decode/feature-extraction
  * running as partition-local batch transforms.
  *
  * The actual image/audio decode is STUBBED (this environment has no codec
  * libraries): [[stubDecode]] computes deterministic fake features from the
  * bytes. Everything around it — schema contract, `mapPartitions` batching,
  * Encoder handling, partition sizing — is the real Spark plumbing a decoder
  * would drop into (swap `stubDecode` for an opencv/ffmpeg call per batch).
  * Keeping decode in `mapPartitions` (not a per-row UDF) is the scale
  * decision: one library init + one buffer per partition, not per row.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap a text table as fake media rows (bytes = utf8 of text) so the
    * plumbing is exercised end-to-end on the `documents` testdata.
    */
  def documentsAsMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("meta"))

  /** Deterministic fake "decode": byte count, a simple rolling checksum and
    * an 8-bin byte histogram as float features. Stands in for a real codec.
    */
  private def stubDecode(bytes: Array[Byte]): (Long, Long, Array[Float]) = {
    if (bytes == null) return (0L, 0L, Array.fill(8)(0f))
    var checksum = 7L
    val hist = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      checksum = (checksum * 31 + b) % 2147483647L
      hist(b >> 5) += 1f
      i += 1
    }
    (bytes.length.toLong, checksum, hist)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = true),
    StructField("frame_checksum", LongType, nullable = false)
  ))

  /** Frame sampling: split each media blob into `nFrames` equal byte chunks
    * (the stub stand-in for video keyframe extraction) and emit one row per
    * frame. flatMap keeps it streaming — no per-row list materialization on
    * the driver, and downstream frame work parallelizes past the per-media
    * grain.
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    require(nFrames > 0)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { iter =>
      iter.flatMap { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) Array.emptyByteArray
          else row.getAs[Array[Byte]](mediaIdx)
        val step = math.max(1, bytes.length / nFrames)
        (0 until nFrames).iterator.map { f =>
          val from = math.min(f * step, bytes.length)
          val until = if (f == nFrames - 1) bytes.length else math.min(from + step, bytes.length)
          val frame = java.util.Arrays.copyOfRange(bytes, from, until)
          var ck = 7L
          frame.foreach(b => ck = (ck * 31 + (b & 0xFF)) % 2147483647L)
          Row(id, f, frame, ck)
        }
      }
    }(org.apache.spark.sql.Encoders.row(frameSchema))
  }

  /** "Resize" stub: deterministic byte subsampling to `targetBytes`, with
    * meta dims rewritten — the plumbing (binary in, smaller binary + new
    * metadata out, batched per partition) is what a real image resize
    * drops into.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) Array.emptyByteArray
          else row.getAs[Array[Byte]](mediaIdx)
        val out =
          if (bytes.length <= targetBytes) bytes
          else {
            val step = bytes.length.toDouble / targetBytes
            Array.tabulate(targetBytes)(i => bytes((i * step).toInt))
          }
        val side = math.sqrt(out.length.toDouble).toInt
        Row(id, out, Row("application/octet-stream", side, side))
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
  }

  /** Partition-local feature extraction over binary media columns. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { iter =>
      // one "decoder context" per partition — where a real codec would init
      iter.map { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        val (n, ck, feats) = stubDecode(bytes)
        Row(id, n, ck, feats.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(featureSchema))
  }
}
