package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star scope): media as opaque `binary`
  * columns plus a typed metadata struct, with decode/feature-extraction
  * running as partition-local batch transforms.
  *
  * Format-specific work is behind the [[MediaDecoder]] seam; the default
  * [[SniffingDecoder]] magic-byte-routes each row to the real pure-JDK
  * codec for its container (ImageIO for PNG/JPEG/GIF/BMP, javax.sound for
  * WAV/AIFF/AU) and to the deterministic [[StubDecoder]] for everything
  * else (true video containers have no JDK codec in this environment).
  * Everything here — schema contract, `mapPartitions` batching, Encoder
  * handling, partition sizing — is the real Spark plumbing a codec drops
  * into: pass a decoder backed by opencv/ffmpeg and no operator changes.
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

  /** Spread the tiny id frame across the cluster BEFORE procedural media
    * generation: the synthetic payload builders and every decoder
    * downstream are CPU-bound per row, and the `documents` fixture is one
    * parquet row group — an unsplittable single-partition scan that would
    * otherwise serialize all codec work on one core (m04–m09 measured
    * exactly that). The exchange moves 8-byte ids, costs nothing, and is
    * the standard "repartition before expensive map" shape; at real scale
    * media arrives pre-partitioned and generators are not in the path.
    */
  private def spreadIds(ids: DataFrame): DataFrame =
    // EXPLICIT partition count: a bare repartition(col) is AQE-coalesced
    // right back to one partition (the id frame is a few KB — tiny by
    // shuffle-size heuristics, huge by per-row codec cost), which silently
    // undoes the spread; REPARTITION_BY_NUM is exempt from coalescing
    ids.repartition(ids.sparkSession.sparkContext.defaultParallelism, col("media_id"))

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

  /** Deterministic procedural test image per id: dimensions and every pixel
    * are pure functions of (id, x, y), so the PNG payload — and everything
    * decoded from it — is identical across partitionings, retries and
    * reruns. Width/height are also closed-form in id (`8 + id % 9`,
    * `6 + id % 5`), which is what lets an IMAGE gate row carry a real SQL
    * oracle: DuckDB can state the expected dimensions without decoding
    * anything, and a hash-green row then proves the whole
    * encode→scan→ImageIO-decode path end to end.
    */
  object ImageGen {
    def width(id: Long): Int = (8 + java.lang.Math.floorMod(id, 9L)).toInt
    def height(id: Long): Int = (6 + java.lang.Math.floorMod(id, 5L)).toInt

    def rgb(id: Long, x: Int, y: Int): Int = {
      val r = java.lang.Math.floorMod(x * 7L + y * 13L + id * 31L, 256L).toInt
      val g = java.lang.Math.floorMod(x * 3L + y * 5L + id * 17L, 256L).toInt
      val b = java.lang.Math.floorMod(x * 11L + y * 2L + id * 7L, 256L).toInt
      (r << 16) | (g << 8) | b
    }

    def png(id: Long): Array[Byte] = {
      val w = width(id); val h = height(id)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(id, x, y)); x += 1 }
        y += 1
      }
      ImageIoDecoder.encodePng(img)
    }

    /** Stored frame count of the synthetic animated GIF — closed-form in
      * id, like the dimensions, so frame-level oracles stay SQL-statable.
      */
    def gifFrames(id: Long): Int = (2 + java.lang.Math.floorMod(id, 3L)).toInt

    /** Deterministic ANIMATED GIF per id: `gifFrames(id)` full frames of
      * the procedural pattern (frame f shifts the pattern seed, so frames
      * are visibly distinct), written with the pure-JDK GIF sequence
      * writer. GIF is palette-quantized, so decoded pixel VALUES are
      * writer-defined — but frame count and dimensions are exact, which is
      * what the m06 oracle pins.
      */
    def gif(id: Long): Array[Byte] = {
      val w = width(id); val h = height(id)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        for (f <- 0 until gifFrames(id)) {
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb(id + 7919L * (f + 1), x, y)); x += 1 }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        try { ios.flush(); ios.close() } catch { case _: java.io.IOException => () }
      }
      bos.toByteArray
    }
  }

  /** The image-payload counterpart of [[documentsAsMedia]]: one real PNG
    * per document id ([[ImageGen]]), encoded executor-side in the same
    * `mapPartitions` grain the decode operators use. This is the
    * deterministic image source the [[ImageIoDecoder]] gate rows and specs
    * decode — real compressed pixels, zero native dependencies.
    */
  def documentsAsImages(documents: DataFrame): DataFrame = {
    val ids = spreadIds(documents.select(col("doc_id").as("media_id")))
    val idIdx = 0
    ids.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        Row(id, ImageGen.png(id),
          Row("image/png", ImageGen.width(id), ImageGen.height(id)))
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
  }

  /** Deterministic WAV test clips: 16-bit signed mono PCM at 8 kHz, frame
    * count closed-form in id (`400 + (id%5)·80` — SQL-statable, like the
    * image dims), samples an integer sawtooth (period `20 + id%7` frames,
    * amplitude 20 000) so every byte is a pure integer function of
    * (id, i). The audio analogue of [[ImageGen]].
    */
  object AudioGen {
    val sampleRate = 8000f
    val amplitude = 20000

    def nFrames(id: Long): Int = (400 + java.lang.Math.floorMod(id, 5L) * 80).toInt
    def period(id: Long): Int = (20 + java.lang.Math.floorMod(id, 7L)).toInt

    /** Sawtooth ramp −A..A over the period; integer math only. */
    def sample(id: Long, i: Int): Short = {
      val p = period(id)
      ((i % p) * 2 * amplitude / p - amplitude).toShort
    }

    def wav(id: Long): Array[Byte] = {
      val n = nFrames(id)
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sample(id, i)
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      // lock-free serializer (byte-identical to AudioSystem.write) — the
      // JDK path's synchronized SPI lookup convoys under 32-thread fan-out
      RiffWav.write(new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false), data)
    }
  }

  /** The audio counterpart of [[documentsAsImages]]: one deterministic WAV
    * clip per document id, decoded for real by [[AudioWavDecoder]].
    */
  def documentsAsAudio(documents: DataFrame): DataFrame = {
    val ids = spreadIds(documents.select(col("doc_id").as("media_id")))
    val idIdx = 0
    ids.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        Row(id, AudioGen.wav(id),
          Row("audio/wav", null, null))
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
  }

  /** [[documentsAsImages]]' multi-frame sibling: one deterministic ANIMATED
    * GIF per document id, for exercising real temporal frame sampling
    * ([[ImageIoDecoder.frames]]) on a format the JDK can both write and
    * read frame-by-frame.
    */
  def documentsAsGifs(documents: DataFrame): DataFrame = {
    val ids = spreadIds(documents.select(col("doc_id").as("media_id")))
    val idIdx = 0
    ids.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        Row(id, ImageGen.gif(id),
          Row("image/gif", ImageGen.width(id), ImageGen.height(id)))
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
  }

  /** Deterministic MJPEG-AVI test clips — the VIDEO sibling of [[ImageGen]]
    * / [[AudioGen]]: `nFrames(id)` JPEG frames of the procedural pattern
    * (frame f shifts the seed, so frames are visibly distinct) muxed into a
    * real RIFF/AVI container by [[AviMjpeg.write]]. Dimensions reuse
    * ImageGen's closed forms and the frame count is closed-form too
    * (`4 + id % 3`), so VIDEO gate rows carry full SQL oracles. JPEG is
    * lossy, so decoded pixel VALUES are codec-defined — dims, frame count
    * and container structure are exact, which is what the oracles pin.
    */
  object VideoGen {
    val fps = 10

    def nFrames(id: Long): Int = (4 + java.lang.Math.floorMod(id, 3L)).toInt

    def avi(id: Long): Array[Byte] = {
      val w = ImageGen.width(id); val h = ImageGen.height(id)
      val frames = (0 until nFrames(id)).map { f =>
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, ImageGen.rgb(id + 104729L * (f + 1), x, y)); x += 1 }
          y += 1
        }
        AviMjpegDecoder.encodeJpeg(img)
      }
      AviMjpeg.write(w, h, fps, frames)
    }
  }

  /** The video counterpart of [[documentsAsImages]]: one deterministic
    * MJPEG-AVI clip per document id, demuxed and decoded for real by
    * [[AviMjpegDecoder]].
    */
  def documentsAsVideos(documents: DataFrame): DataFrame = {
    val ids = spreadIds(documents.select(col("doc_id").as("media_id")))
    val idIdx = 0
    ids.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        Row(id, VideoGen.avi(id),
          Row("video/x-msvideo", ImageGen.width(id), ImageGen.height(id)))
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
  }

  /** Mixed-modality payload column — the column shape [[SniffingDecoder]]
    * exists for: deterministically cycles real PNG / real WAV / real
    * animated GIF / OPAQUE utf8-text payloads by `doc_id % 4`, so one
    * binary column carries three decodable container formats plus bytes no
    * codec accepts. The generic m01–m03 gate rows run over this frame with
    * the dispatching default decoder: real codecs fire on the decodable
    * rows, the stub only on the opaque ones (spec-pinned).
    */
  def documentsAsMixedMedia(documents: DataFrame): DataFrame = {
    val rows = spreadIds(documents.select(col("doc_id").as("media_id"), col("text")))
    rows.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(0)
        java.lang.Math.floorMod(id, 4L) match {
          case 0L => Row(id, ImageGen.png(id),
            Row("image/png", ImageGen.width(id), ImageGen.height(id)))
          case 1L => Row(id, AudioGen.wav(id), Row("audio/wav", null, null))
          case 2L => Row(id, ImageGen.gif(id),
            Row("image/gif", ImageGen.width(id), ImageGen.height(id)))
          case _ =>
            // null text → null media, like the null-safe encode() the plain
            // documentsAsMedia path uses; every decoder handles null bytes
            val t = row.getString(1)
            Row(id,
              if (t == null) null else t.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              Row("application/octet-stream", null, null))
        }
      }
    }(org.apache.spark.sql.Encoders.row(mediaSchema))
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
      decoder: MediaDecoder = SniffingDecoder): DataFrame = {
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
      decoder: MediaDecoder = SniffingDecoder): DataFrame = {
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

  val phashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash_hi", LongType, nullable = true),
    StructField("phash_lo", LongType, nullable = true)
  ))

  /** Perceptual image hash (dHash, [[MediaDecoder.dHash64]]) over a binary
    * image column: decode at the codec boundary (per-partition loop, the
    * extractFeatures shape), hash the pixel grid, emit the 32-bit halves.
    * Undecodable/null payloads yield null hashes (the dispatcher-family
    * null contract). The all-integer hash arithmetic means a corpus of
    * procedurally generated images ([[ImageGen]]) gets a REAL SQL oracle:
    * the expected hash is closed-form in (id, x, y) without decoding
    * anything, so a hash-green row proves every sampled pixel of the
    * PNG encode → scan → ImageIO decode path, not just the dimensions.
    */
  def imagePhash(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { iter =>
      iter.map { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        // Memory-cached decode (the ImageIoDecoder path) — the
        // ImageIO.read(InputStream) convenience overload would spill every
        // blob through a temp FILE on the executor (ImageIO's default disk
        // cache): a per-row disk tax + temp-file churn at scale.
        val img = ImageIoDecoder.read(bytes).orNull
        if (img == null || img.getWidth < 1 || img.getHeight < 1) Row(id, null, null)
        else {
          val (hi, lo) = MediaDecoder.dHash64(img)
          Row(id, hi, lo)
        }
      }
    }(org.apache.spark.sql.Encoders.row(phashSchema))
  }

  /** Perceptual image dedup: group by the exact [[imagePhash]] dHash
    * (radius-0 perceptual identity — same sampled luma structure even
    * across different encodes) and mark everything but the min-id keeper
    * of each group a duplicate. Cardinality-preserving verdict rows (the
    * d27/d29 contract): `(media_id, phash_hi, phash_lo, keeper,
    * group_size, is_dup)`. Undecodable payloads are excluded — no pixels,
    * no perceptual identity (the m10 null contract).
    *
    * Scale shape: decode is the per-partition map pass; the only shuffle
    * is one window on the 64-bit hash key. Radius > 0 near-dup pairing
    * would add the banded-blocking join (the d03 machinery) on top of the
    * same hash column.
    */
  def phashDedup(media: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("phash_hi", "phash_lo")
    imagePhash(media)
      .where(col("phash_hi").isNotNull)
      .withColumn("keeper", min(col("media_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", col("media_id") =!= col("keeper"))
  }

  val audioFpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("window_idx", IntegerType, nullable = false),
    StructField("d_energy", LongType, nullable = false),
    StructField("a_energy", LongType, nullable = false)
  ))

  /** Audio fingerprinting primitive (Haitsma–Kalker 2002 shape): the PCM
    * stream is cut into fixed `windowSamples`-sample windows and each
    * window yields its level-1 Haar band energies — detail
    * `Σ (s₂ᵢ − s₂ᵢ₊₁)²` (high band) and approximation `Σ (s₂ᵢ + s₂ᵢ₊₁)²`
    * (low band), computed on the RAW integer sample values so the result
    * is bit-exact across engines (the fixed-point-PageRank discipline
    * applied to DSP: a cos/sin DFT would drift in the last ulp between
    * libm implementations and break hash parity). The robust-hash bit
    * stream — sign of the detail-energy delta between consecutive
    * windows — is derived downstream with one lag window
    * ([[audioFingerprint]] keeps the energies so callers can re-derive
    * bits at any threshold). Only full windows count (the tail remainder
    * carries no stable band estimate); undecodable payloads yield no rows
    * (no samples → no fingerprint, the m10 null contract). Channel 0 is
    * fingerprinted; multi-channel mixdown is the caller's resample step.
    *
    * Scale shape: decode + energy fold is one partition-local pass
    * emitting a handful of narrow integer rows per clip; the only shuffle
    * is the per-clip lag window over ~n/windowSamples rows.
    */
  def audioFingerprint(media: DataFrame, windowSamples: Int = 64): DataFrame = {
    require(windowSamples >= 2 && windowSamples % 2 == 0,
      s"audioFingerprint: windowSamples must be even and >= 2, got $windowSamples")
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    val energies = media.mapPartitions { iter =>
      iter.flatMap { row =>
        val id = row.getLong(idIdx)
        val bytes = if (row.isNullAt(mediaIdx)) null else row.getAs[Array[Byte]](mediaIdx)
        val samples = AudioWavDecoder.rawSamples(bytes)
        if (samples == null) Iterator.empty
        else {
          val nWin = samples.length / windowSamples
          (0 until nWin).iterator.map { w =>
            var d = 0L; var a = 0L
            var i = 0
            while (i < windowSamples) {
              val s0 = samples(w * windowSamples + i).toLong
              val s1 = samples(w * windowSamples + i + 1).toLong
              d += (s0 - s1) * (s0 - s1)
              a += (s0 + s1) * (s0 + s1)
              i += 2
            }
            Row(id, w, d, a)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(audioFpSchema))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("window_idx")
    energies.withColumn("bit",
      (col("d_energy") > lag(col("d_energy"), 1).over(w)).cast("int"))
  }

  /** Partition-local feature extraction over binary media columns. */
  def extractFeatures(
      media: DataFrame,
      decoder: MediaDecoder = SniffingDecoder): DataFrame = {
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
