package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming WebDataset ingestion: tar shards arriving as FILES are
  * streamed through Spark's binaryFile source, member-exploded with the
  * same validated ustar parser the batch path uses, and sunk to parquet —
  * the arrival topology of a production multimodal corpus (shards land in
  * object storage; the pipeline tails the bucket).
  */
class TarIngestSpec extends SparkSpec {

  test("shards arriving as files stream into member rows identical to the batch parse") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(48)
    val shards = graft.operators.TarShards.documentsAsTarShards(docs, 16).collect()
    val tmp = java.nio.file.Files.createTempDirectory("graft-taringest").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    shards.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"$tmp/in/shard-${r.getLong(0)}%05d.tar"),
        r.getAs[Array[Byte]](1))
    }
    val stream = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(s"$tmp/in")
      .select(
        regexp_extract(col("path"), "shard-(\\d+)\\.tar", 1).cast("long").as("shard_id"),
        col("content").as("shard"))
    val members = graft.operators.TarShards.readMembers(stream)
    val q = members.writeStream.format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("shard_id", "member").as[(Long, String)].collect().toSet
    val batch = graft.operators.TarShards.readMembers(
      graft.operators.TarShards.documentsAsTarShards(docs, 16))
      .select("shard_id", "member").as[(Long, String)].collect().toSet
    assert(streamed == batch && streamed.size == 96, // 48 docs × 2 members
      s"streamed ${streamed.size} members, batch ${batch.size}")
  }
}
