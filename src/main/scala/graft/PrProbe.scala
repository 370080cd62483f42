package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (r18): A/B pageRank under AQE on/off within one
  * JVM — VERDICT item 6 asked whether disabling AQE inside the fixed-
  * iteration loop helps (fewer replans) or hurts (loses the runtime
  * broadcast of the small rank/outdeg sides). Delete when the round closes.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    def run(): Double = {
      val edges = spark.table("events").select(col("user_id").as("src"),
        get_json_object(col("props"), "$.k").cast("long").as("dst"))
      val df = graft.operators.GraphOps.pageRankTopK(edges, "src", "dst", k = 20, iterations = 10)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (aqe <- Seq(true, false, true, false, true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      run() // warm for this conf
      val times = (1 to 3).map(_ => run()).sorted
      System.err.println(f"aqe=$aqe%-5s median=${times(1)}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
