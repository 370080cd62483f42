package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (one JVM-wide session; cheap reuse). */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.host", "localhost")
    // CTAS specs execute against a real (temp) warehouse, not the repo cwd
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** `df` rebuilt over an RDD pre-split across the session's cores — the
    * at-scale input shape for plan-shape pins: a real corpus scan arrives
    * in ≥ cores splits, so the operators' conditional input spread
    * (graft.operators.Spread, r17) is a no-op and no repartition Exchange
    * enters the measured plan. The split happens at the RDD layer
    * precisely so the SQL plan under test doesn't see an extra Exchange
    * from the test harness itself.
    */
  def wellSplit(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      df.rdd.repartition(spark.sparkContext.defaultParallelism), df.schema)
}
