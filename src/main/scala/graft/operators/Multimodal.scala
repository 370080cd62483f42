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
