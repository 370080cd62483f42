package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Measured economics of the persisted incremental dedup index (d34/d35):
  * grow the index through N append waves and time each wave's PROBE as a
  * function of index size — the evidence behind BASELINE.md's claim that
  * the increment path scales with |delta| + |matched rows|, not |corpus|.
  * Also times the last probe before/after [[Dedup.compactMinhashIndex]]
  * to isolate the small-file cost appends accumulate (d40's policy).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IndexGrowthBench"
  */
object IndexGrowthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val table = "graft_growth_idx"

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def indexDocs(): Long = spark.table(s"${table}_docs").count()
    def bandFiles(): Int = {
      val loc = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath, s"${table}_bands")
      Option(loc.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    }

    // base = half the corpus; 5 waves of ~10% each grow the index to full
    Dedup.writeMinhashIndex(spark,
      docs.where(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 5),
      "doc_id", "text", table)
    println(f"# wave | index_docs | band_files | probe_s | delta_rows | survivors")
    val waves = Seq(6L, 7L, 8L, 9L, 0L)
    var lastProbeSec = 0.0
    for ((w, i) <- waves.zipWithIndex) {
      val delta = docs.where(col("doc_id") % 10 === w)
      val n = delta.count()
      val idxN = indexDocs()
      // time the probe alone (count() forces the full dedup plan)
      val (survivors, probeSec) = timed {
        Dedup.incrementalDedupMd5(spark, delta, "doc_id", "text", table).count()
      }
      lastProbeSec = probeSec
      println(f"wave${i + 1} | $idxN%10d | ${bandFiles()}%10d | $probeSec%7.2f | $n%10d | $survivors")
      // admit the wave's survivors: the st15 grow-the-index loop, batch face
      val admitted = Dedup.incrementalDedupMd5(spark, delta, "doc_id", "text", table)
        .localCheckpoint(true)
      Dedup.appendMinhashIndex(spark, admitted, "doc_id", "text", table)
    }
    // small-file effect: re-time the last wave's probe, compact, re-time
    val lastDelta = docs.where(col("doc_id") % 10 === 0L)
    val (_, preCompact) = timed {
      Dedup.incrementalDedupMd5(spark, lastDelta, "doc_id", "text", table).count()
    }
    val preFiles = bandFiles()
    val (_, compactSec) = timed { Dedup.compactMinhashIndex(spark, table) }
    val (_, postCompact) = timed {
      Dedup.incrementalDedupMd5(spark, lastDelta, "doc_id", "text", table).count()
    }
    println(f"compaction: band_files $preFiles -> ${bandFiles()}, " +
      f"probe $preCompact%.2fs -> $postCompact%.2fs, compact cost $compactSec%.2fs")
    spark.stop()
  }
}
