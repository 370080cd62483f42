package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured cost of constraint enforcement on plain INSERTs: the same
  * batch appended to (a) an unconstrained table (Spark-native INSERT) and
  * (b) a PRIMARY KEY + NOT NULL + CHECK table (front-end path: batch dup
  * aggregate + key-column-pruned broadcast-semi probe + map-side
  * raise_error guards), as the TARGET grows 1×/4×/16×. The probe reads
  * only the key column, so the overhead should grow with the key column's
  * footprint, not the table's — the honest no-index stand-in for DuckDB's
  * ART lookup.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ConstraintOverheadBench"
  */
object ConstraintOverheadBench {
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
    val psql = graft.psql.Psql(spark)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "value")

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println("# scale | target_rows | plain_insert_s | constrained_insert_s | overhead_s")
    for (k <- Seq(1, 4, 16)) {
      val big = events.crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("event_id") * k + col("rep")).as("event_id"),
          col("user_id"), col("value"))
      Seq("graft_cob_plain", "graft_cob_cons").foreach { t =>
        graft.operators.Bucketing.dropTableAndLocation(spark, t)
        graft.operators.Bucketing.dropTableAndLocation(spark, t + "__graft_cow")
      }
      big.write.mode("overwrite").format("parquet").saveAsTable("graft_cob_plain")
      psql.sql("create table graft_cob_cons (event_id bigint primary key, " +
        "user_id bigint not null, value double, check (user_id >= 0))")
      psql.sql("insert into graft_cob_cons select * from graft_cob_plain")
      val n = spark.table("graft_cob_cons").count()
      // the measured statement: a fixed 10k-row fresh-key batch
      big.limit(10000)
        .select((col("event_id") + lit(900000000L)).as("event_id"),
          col("user_id"), col("value"))
        .createOrReplaceTempView("graft_cob_batch")
      val plainS = timed(psql.sql(
        "insert into graft_cob_plain select * from graft_cob_batch"))
      val consS = timed(psql.sql(
        "insert into graft_cob_cons select * from graft_cob_batch"))
      println(f"$k%5d | $n%10d | $plainS%13.2f | $consS%19.2f | ${consS - plainS}%9.2f")
    }
    Seq("graft_cob_plain", "graft_cob_cons").foreach(
      graft.operators.Bucketing.dropTableAndLocation(spark, _))
    spark.stop()
  }
}
