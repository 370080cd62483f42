package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch diagnostics main (optimization round): runs one declared query
  * through the bench protocol (warm + timed noop saves) with a stage
  * listener, printing per-stage task counts / runtimes so the slow stage of
  * a regression is identifiable without the UI. Not part of the driver
  * contract; delete when the round closes.
  * Usage: sbt "runMain graft.StageProbe <queryName>"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
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
    val d = SparkEntry.defs.find(_.name == name).getOrElse(sys.error(s"unknown: $name"))
    // warm
    d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        val run = si.taskMetrics.executorRunTime
        val cpu = si.taskMetrics.executorCpuTime / 1000000
        System.err.println(f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%4d " +
          f"wall=${dur.getOrElse(-1L)}%6d ms taskRun=$run%7d ms taskCpu=$cpu%7d ms  " +
          si.name.takeWhile(_ != '\n').take(90))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    System.err.println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
