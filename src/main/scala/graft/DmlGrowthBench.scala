package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured DML economics behind BASELINE.md's partition-pruning claim:
  * replicate the events table 1×/4×/16×, then time the SAME logical
  * DELETE and UPDATE against (a) a table PARTITIONED by event_type —
  * the pruned dynamic-overwrite path — and (b) an unpartitioned copy —
  * the whole-table shadow swap. The pruned statement's cost should track
  * the AFFECTED partition's size; the unpartitioned one tracks the whole
  * table. Also times MERGE two ways across the same growth: against the
  * unpartitioned copy (full copy-on-write by design) and against the
  * partitioned table with a source confined to one partition — the
  * partition-pruned MERGE path, which should track the touched
  * partition, not the table (r14 verdict item 6).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DmlGrowthBench"
  */
object DmlGrowthBench {
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
      .select("event_id", "user_id", "value", "event_type")

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    println("# scale | rows | del_pruned_s | del_full_s | upd_pruned_s | upd_full_s | merge_full_s | merge_pruned_s")
    for (k <- Seq(1, 4, 16)) {
      val big = events.crossJoin(
          spark.range(k).select(col("id").as("rep")))
        .select((col("event_id") * k + col("rep")).as("event_id"),
          col("user_id"), col("value"), col("event_type"))
      val rows = big.count()
      def seed(name: String, partitioned: Boolean): Unit = {
        graft.operators.Bucketing.dropTableAndLocation(spark, name)
        graft.operators.Bucketing.dropTableAndLocation(spark, name + "__graft_cow")
        val w = big.write.mode("overwrite").format("parquet")
        (if (partitioned) w.partitionBy("event_type") else w).saveAsTable(name)
      }
      // DELETE confined to one partition's rows
      seed("graft_dgb_p", partitioned = true)
      seed("graft_dgb_f", partitioned = false)
      val delPruned = timed(psql.sql(
        "delete from graft_dgb_p where event_type = 'click' and value < 0.2"))
      val delFull = timed(psql.sql(
        "delete from graft_dgb_f where event_type = 'click' and value < 0.2"))
      // UPDATE confined to one partition
      val updPruned = timed(psql.sql(
        "update graft_dgb_p set value = -value where event_type = 'purchase' and user_id % 5 = 0"))
      val updFull = timed(psql.sql(
        "update graft_dgb_f set value = -value where event_type = 'purchase' and user_id % 5 = 0"))
      // MERGE: fixed-size source batch against the grown target (full COW)
      events.limit(20000)
        .select((col("event_id")).as("mk"), col("value").as("mv"))
        .groupBy("mk").agg(max("mv").as("mv"))
        .createOrReplaceTempView("graft_dgb_src")
      val mergeS = timed(psql.sql(
        """merge into graft_dgb_f t using graft_dgb_src s on t.event_id = s.mk
          |when matched then update set value = s.mv
          |when not matched and s.mk % 2 = 0 then
          |  insert (event_id, value) values (s.mk + 900000000, s.mv)""".stripMargin))
      // pruned MERGE: the source's matches live in ONE partition (keys are
      // drawn from click rows) and the insert clause lands there too, so
      // the stats pass confines the dynamic overwrite to that directory
      big.where(col("event_type") === "click").limit(20000)
        .select(col("event_id").as("mk"), col("value").as("mv"))
        .groupBy("mk").agg(max("mv").as("mv"))
        .createOrReplaceTempView("graft_dgb_src_click")
      val mergePruned = timed(psql.sql(
        """merge into graft_dgb_p t using graft_dgb_src_click s on t.event_id = s.mk
          |when matched then update set value = s.mv
          |when not matched and s.mk % 2 = 0 then
          |  insert (event_id, value, event_type) values (s.mk + 900000000, s.mv, 'click')""".stripMargin))
      println(f"$k%5d | $rows%9d | $delPruned%10.2f | $delFull%9.2f | " +
        f"$updPruned%10.2f | $updFull%9.2f | $mergeS%7.2f | $mergePruned%7.2f")
    }
    Seq("graft_dgb_p", "graft_dgb_f").foreach { t =>
      graft.operators.Bucketing.dropTableAndLocation(spark, t)
      graft.operators.Bucketing.dropTableAndLocation(spark, t + "__graft_cow")
    }
    spark.stop()
  }
}
