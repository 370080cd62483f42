package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r18 plan-free spread probe ([[Spread.probePartitions]]) to the
  * ground truth it replaced (`df.rdd.getNumPartitions`): the probe must
  * agree on every input shape a spread call site can see, or the
  * spread-or-not decision — and with it every pinned plan shape — silently
  * flips.
  */
class SpreadProbeSpec extends SparkSpec {
  import spark.implicits._

  private def groundTruth(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("probePartitions agrees with the physical scan on file sources") {
    val single = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(Spread.probePartitions(single) == groundTruth(single))

    // project/filter wrappers don't change the scan's split count
    val wrapped = single.where(col("doc_id") > 10).select("doc_id", "text")
    assert(Spread.probePartitions(wrapped) == groundTruth(wrapped))

    // temp view (SubqueryAlias) over the scan
    single.createOrReplaceTempView("spread_probe_docs")
    val viaView = spark.table("spread_probe_docs")
    assert(Spread.probePartitions(viaView) == groundTruth(viaView))

    // multi-file source: packing of small files must match Spark's own
    val dir = java.nio.file.Files.createTempDirectory("spread-probe").toString
    try {
      single.limit(500).repartition(7).write.mode("overwrite").parquet(dir)
      val multi = spark.read.parquet(dir)
      assert(Spread.probePartitions(multi) == groundTruth(multi))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("probePartitions agrees on RDD-backed frames (the wellSplit shape)") {
    val ws = wellSplit(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    assert(Spread.probePartitions(ws) == groundTruth(ws))
  }

  test("probePartitions falls back exactly on non-scan shapes") {
    // an aggregate is not a scan shape: the probe must take the fallback
    // path and still agree with ground truth (it IS the ground truth there)
    val agg = Seq((1, "a"), (2, "b"), (3, "a")).toDF("n", "g").groupBy("g").count()
    assert(Spread.probePartitions(agg) == groundTruth(agg))
  }
}
