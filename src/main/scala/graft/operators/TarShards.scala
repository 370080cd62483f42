package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal POSIX ustar writer/parser — the container format WebDataset-style
  * multimodal training corpora ship in (one tar shard = a sequence of
  * samples; each sample's modalities are members sharing a basename:
  * `000042.txt`, `000042.png`, …). Pure byte-level, no dependencies, and
  * the parser VALIDATES (magic + header checksum), so corrupt shards fail
  * loudly instead of yielding garbage members.
  *
  * Writer determinism: fixed mode/uid/gid/mtime fields, so identical
  * members always produce identical shard bytes — what lets tar-path gate
  * rows hash-check.
  */
private[operators] object Ustar {

  private val BLOCK = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, zero-padded, NUL terminated (ustar numeric form)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"ustar: value $v too large for $width-byte field")
    val out = new Array[Byte](width)
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { out(i) = '0'; i += 1 }
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII).copyToArray(out, pad)
    out(width - 1) = 0
    out
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(nameBytes.length <= 100, s"ustar: member name too long: $name")
    val h = new Array[Byte](BLOCK)
    nameBytes.copyToArray(h, 0)                        // name [0,100)
    octal(420, 8).copyToArray(h, 100)                  // mode 0644
    octal(0, 8).copyToArray(h, 108)                    // uid
    octal(0, 8).copyToArray(h, 116)                    // gid
    octal(size, 12).copyToArray(h, 124)                // size
    octal(0, 12).copyToArray(h, 136)                   // mtime (fixed: determinism)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)     // chksum = spaces while summing
    h(156) = '0'                                       // typeflag: regular file
    "ustar".getBytes.copyToArray(h, 257)               // magic "ustar\0" + version "00"
    h(262) = 0; h(263) = '0'; h(264) = '0'
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += h(i) & 0xFF; i += 1 }
    val c = java.lang.Long.toOctalString(sum)
    val cp = 6 - c.length
    i = 0
    while (i < cp) { h(148 + i) = '0'; i += 1 }
    c.getBytes.copyToArray(h, 148 + cp)
    h(154) = 0; h(155) = ' '
    h
  }

  def write(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val size = members.map { case (_, d) =>
      BLOCK + ((d.length + BLOCK - 1) / BLOCK) * BLOCK
    }.sum + 2 * BLOCK
    val out = new Array[Byte](size)
    var off = 0
    members.foreach { case (name, data) =>
      header(name, data.length.toLong).copyToArray(out, off); off += BLOCK
      data.copyToArray(out, off)
      off += ((data.length + BLOCK - 1) / BLOCK) * BLOCK // zero padding is implicit
    }
    out // trailing two zero blocks are the remaining zeros
  }

  /** Parse a ustar archive; throws IllegalArgumentException on bad magic or
    * checksum (a corrupt shard must fail the task, not emit garbage).
    */
  def parse(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(bytes != null && bytes.length % BLOCK == 0, "ustar: truncated archive")
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + BLOCK <= bytes.length) {
      if (bytes(off) == 0) {
        // end-of-archive marker is an ALL-zero block; a header whose first
        // byte happens to be zeroed (corruption) must be rejected, not
        // silently read as a truncated archive (property-test finding)
        var z = 1
        while (z < BLOCK && bytes(off + z) == 0) z += 1
        require(z == BLOCK, s"ustar: corrupt header at offset $off (NUL name, non-zero block)")
        done = true
      } else {
        require(bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' && bytes(off + 261) == 'r',
          s"ustar: bad magic at offset $off")
        var sum = 0L
        var i = 0
        while (i < BLOCK) {
          sum += (if (i >= 148 && i < 156) ' '.toByte else bytes(off + i)) & 0xFF
          i += 1
        }
        // numeric fields are octal digits + NUL/space terminators — keep
        // only the digits before parsing
        def octalField(fieldOff: Int, width: Int): Long = {
          val f = new String(bytes, off + fieldOff, width,
            java.nio.charset.StandardCharsets.US_ASCII).filter(c => c >= '0' && c <= '7')
          require(f.nonEmpty, s"ustar: empty numeric field at offset ${off + fieldOff}")
          java.lang.Long.parseLong(f, 8)
        }
        val stated = octalField(148, 8)
        require(sum == stated, s"ustar: checksum mismatch at offset $off ($sum != $stated)")
        var n = 0
        while (n < 100 && bytes(off + n) != 0) n += 1
        val name = new String(bytes, off, n, java.nio.charset.StandardCharsets.US_ASCII)
        // size stays Long until the bounds check passes: a crafted header
        // (valid checksum, 12 octal digits go up to 8^11 ≈ 8.6e9) stating
        // a size past Int.MaxValue would wrap to a small positive Int,
        // slip the truncation check, and misalign the next offset — which
        // can land on a zero region and read as end-of-archive, silently
        // truncating the member list (review finding)
        val sizeL = octalField(124, 12)
        // a header stating more data than the archive holds is truncation —
        // copyOfRange would silently zero-pad the member's tail (review
        // finding), violating the fail-loudly contract
        require(sizeL >= 0 && off + BLOCK + sizeL <= bytes.length,
          s"ustar: truncated archive — member '$name' states $sizeL bytes, " +
            s"only ${bytes.length - off - BLOCK} remain")
        val size = sizeL.toInt
        out += name -> java.util.Arrays.copyOfRange(bytes, off + BLOCK, off + BLOCK + size)
        off += BLOCK + ((size + BLOCK - 1) / BLOCK) * BLOCK
      }
    }
    out.result()
  }
}

/** WebDataset-style tar-shard plumbing: group samples into tar shards
  * (`docsPerShard` samples each; each sample contributes a `.txt` member
  * and a real `.png` member sharing the zero-padded id basename), and
  * explode shards back into per-member rows for downstream decoders.
  *
  * Scale shape: shard assembly is `mapPartitions` after one narrow
  * repartition on shard id (members of a shard must co-locate — the only
  * shuffle); member extraction is a pure map-side explode (shard rows ×
  * members, no shuffle at all). At real scale shards arrive as binary
  * files; the extraction path is exactly this explode.
  */
object TarShards {

  val shardSchema: StructType = StructType(Seq(
    StructField("shard_id", LongType, nullable = false),
    StructField("shard", BinaryType, nullable = false)))

  val memberSchema: StructType = StructType(Seq(
    StructField("shard_id", LongType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Fixed-width 12-digit basename — ids must fit, or the WebDataset
    * fixed-width/lexicographic-ordering convention (and the consumers'
    * positional id parse) silently breaks.
    */
  private def basename(id: Long): String = {
    require(id >= 0 && id < 1000000000000L,
      s"TarShards: doc id $id outside the 12-digit basename range")
    f"$id%012d"
  }

  /** Shared shard-assembly skeleton: co-locate docs by shard id (the only
    * shuffle), group per partition, and tar each shard's members in id
    * order (deterministic shard bytes). Both member layouts below are one
    * `rowToMembers` away from it — the repartition key, null-text
    * handling and determinism-by-id-sort invariants live once.
    */
  private def shardsFrom(documents: DataFrame, docsPerShard: Int)(
      rowToMembers: (Long, String) => Seq[(String, Array[Byte])]): DataFrame = {
    require(docsPerShard >= 1, "TarShards: docsPerShard must be >= 1")
    val spark = documents.sparkSession
    val rows = documents
      .select((col("doc_id") / docsPerShard).cast("long").as("sid"),
        col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("sid"))
    rows.mapPartitions { iter =>
      iter.toSeq.groupBy(_.getLong(0)).iterator.map { case (sid, docs) =>
        val members = docs.sortBy(_.getLong(1)).flatMap { r =>
          rowToMembers(r.getLong(1), Option(r.getString(2)).getOrElse(""))
        }
        Row(sid, Ustar.write(members))
      }
    }(org.apache.spark.sql.Encoders.row(shardSchema))
  }

  /** One tar shard per `docsPerShard` documents: members
    * `<id>.txt` (utf8 text) + `<id>.png` ([[Multimodal.ImageGen]] pixels),
    * id-sorted within the shard (deterministic shard bytes).
    */
  def documentsAsTarShards(documents: DataFrame, docsPerShard: Int = 64): DataFrame =
    shardsFrom(documents, docsPerShard) { (id, text) =>
      Seq(
        s"${basename(id)}.txt" ->
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        s"${basename(id)}.png" -> Multimodal.ImageGen.png(id))
    }

  /** GZIP variant — the `.gz`-member WebDataset convention: one
    * `<id>.txt.gz` member per sample (pure-JDK `GZIPOutputStream`, deflate
    * inside the container — the layout that trades member-level random
    * access for storage).
    */
  def documentsAsGzipTarShards(documents: DataFrame, docsPerShard: Int = 64): DataFrame =
    shardsFrom(documents, docsPerShard) { (id, text) =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      gz.close()
      Seq(s"${basename(id)}.txt.gz" -> bos.toByteArray)
    }

  /** Decompress `.gz` member payloads in place (others pass through) — at
    * the per-partition codec boundary, like every decoder here.
    */
  def gunzipPayloads(members: DataFrame): DataFrame = {
    val sidIdx = members.schema.fieldIndex("shard_id")
    val nameIdx = members.schema.fieldIndex("member")
    val payIdx = members.schema.fieldIndex("payload")
    members.mapPartitions { iter =>
      iter.map { r =>
        val name = r.getString(nameIdx)
        val payload = r.getAs[Array[Byte]](payIdx)
        val out =
          if (!name.endsWith(".gz")) payload
          else {
            val in = new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(payload))
            try in.readAllBytes() finally in.close()
          }
        Row(r.getLong(sidIdx), name, out)
      }
    }(org.apache.spark.sql.Encoders.row(memberSchema))
  }

  /** Explode shards into `(shard_id, member, payload)` rows — map-side,
    * parser-validated (bad shard ⇒ task failure, never silent loss).
    */
  def readMembers(shards: DataFrame): DataFrame = {
    val sidIdx = shards.schema.fieldIndex("shard_id")
    val shardIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { iter =>
      iter.flatMap { r =>
        Ustar.parse(r.getAs[Array[Byte]](shardIdx)).iterator.map { case (name, data) =>
          Row(r.getLong(sidIdx), name, data)
        }
      }
    }(org.apache.spark.sql.Encoders.row(memberSchema))
  }
}
