package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star scope): media as opaque `binary`
  * columns plus a typed metadata struct, with decode/feature-extraction
  * running as partition-local batch transforms.
  *
  * Format-specific work is behind the [[MediaDecoder]] seam; the default
  * [[StubDecoder]] computes deterministic fake features from the bytes
  * (this environment has no codec libraries). Everything here — schema
  * contract, `mapPartitions` batching, Encoder handling, partition sizing —
  * is the real Spark plumbing a codec drops into: pass a decoder backed by
  * opencv/ffmpeg and no operator changes. Keeping decode in `mapPartitions`
  * (not a per-row UDF) is the scale decision: one library init + one buffer
  * per partition, not per row.
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

  /** Frame sampling: ask the decoder for `nFrames` frame payloads per blob
    * (the stub chunks bytes; a video decoder samples keyframes) and emit one
    * row per frame. flatMap keeps it streaming — no per-row list
    * materialization, and downstream frame work parallelizes past the
    * per-media grain. The frame checksum is computed operator-side so every
    * decoder's frames get the same content id for free.
    */
  def sampleFrames(
      media: DataFrame,
      nFrames: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(nFrames > 0)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { iter =>
      iter.flatMap { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        decoder.frames(bytes, nFrames).iterator.zipWithIndex.map { case (frame, f) =>
          Row(id, f, frame, MediaDecoder.checksum(frame))
        }
      }
    }(org.apache.spark.sql.Encoders.row(frameSchema))
  }

  /** Resize: decoder downscales each blob to at most `targetBytes` and
    * reports the new dimensions; meta is rewritten accordingly (binary in,
    * smaller binary + new metadata out, batched per partition).
    */
  def resize(
      media: DataFrame,
      targetBytes: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(targetBytes > 0)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        val r = decoder.resize(bytes, targetBytes)
        Row(id, r.bytes, Row("application/octet-stream", r.width, r.height))
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
  }

  /** Partition-local feature extraction over binary media columns. */
  def extractFeatures(
      media: DataFrame,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        val d = decoder.decode(bytes)
        Row(id, d.nBytes, d.checksum, d.features.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(featureSchema))
  }
}
