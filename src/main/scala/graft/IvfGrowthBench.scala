package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Bucketing, Similarity}

/** Measured economics of the persisted IVF index growth path (d36/d41):
  * build the index from half the corpus, grow it through append waves, and
  * time the PROBE after each wave — the evidence behind the claim that the
  * probe's cost tracks the PROBED DIRECTORIES (DPP reads nProbe/nCentroids
  * of the data), not the number of appends that built the table, and that
  * each append's cost scales with |delta| (assignment of the delta only).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IvfGrowthBench"
  */
object IvfGrowthBench {
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
    Tables.register(spark, sfDir)
    val table = "graft_ivf_growth"

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // fixed centroids: the production trainCentroids over the full corpus
    // (the same determinism story as the d21–d25 parity family)
    val cents = Similarity.trainCentroids(
      spark.table("embeddings"), "vec_id", "embedding", nCentroids = 16)
    import spark.implicits._
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cid", "cent")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cid").asc)
    def assign(preds: org.apache.spark.sql.Column) = spark.table("embeddings")
      .where(preds)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(centDf))
      .withColumn("sim", Similarity.cosine(col("v"), col("cent")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))

    val probes = spark.table("embeddings").where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("sim", Similarity.cosine(col("qv"), col("cent")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("cid").asc)))
      .where(col("rn") <= 4)
      .select(col("query_id"), col("cid"), col("qv"))
      .localCheckpoint(true)

    def probe(): Long = {
      val idx = spark.table(table)
      val scored = idx.join(broadcast(probes), Seq("cid"))
        .where(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"),
          Similarity.cosine(col("qv"), col("v")).as("sim"))
      val rw = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(rw)).where(col("rank") <= 5).count()
    }

    val (_, buildS) = timed {
      Bucketing.writePartitioned(spark, assign(col("vec_id") % 10 >= 1 && col("vec_id") % 10 <= 5),
        table, "cid")
    }
    println(f"# wave | index_vecs | append_s | probe_s | topk_rows")
    val (n0, p0) = timed(probe())
    println(f"base    ${spark.table(table).count()}%10d   build=$buildS%.3f  $p0%.3f  $n0 (build = assign+write half corpus)")
    Seq(6L, 7L, 8L, 9L, 0L).zipWithIndex.foreach { case (m, i) =>
      val (_, appendS) = timed {
        Bucketing.appendPartitioned(spark, assign(col("vec_id") % 10 === m), table, "cid")
      }
      val (nk, probeS) = timed(probe())
      println(f"wave ${i + 1}  ${spark.table(table).count()}%10d   $appendS%.3f  $probeS%.3f  $nk")
    }
    spark.stop()
  }
}
