package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured cost of the opt-in FK referential checks as the CHILD table
  * grows 1×/4×/16× (r17: the checks now cover the full surface — child
  * INSERT/UPDATE resolve against the parent, parent DELETE/key-UPDATE
  * probe the children):
  *
  *  - parent-side DELETE probe: the same unreferenced-key DELETE with
  *    enforcement OFF vs ON — both pay the parent's copy-on-write
  *    rewrite, so the difference is the child semi-probe. The probe scans
  *    ONLY the child's FK column (plan-pinned in PlanQualitySpec), so it
  *    should grow with that column's footprint, never the child's full
  *    width (the child here carries a fat payload column to make the
  *    difference visible);
  *  - child-side INSERT check: a fixed 10k-row valid batch appended with
  *    enforcement OFF vs ON — the anti join probes the PARENT's key
  *    column, so it should stay FLAT as the child grows.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.FkOverheadBench"
  */
object FkOverheadBench {
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

    println("# scale | child_rows | del_off_s | del_on_s | del_probe_s | ins_off_s | ins_on_s | ins_probe_s")
    for (k <- Seq(1, 4, 16)) {
      Seq("graft_fob_par", "graft_fob_chi").foreach { t =>
        graft.operators.Bucketing.dropTableAndLocation(spark, t)
        graft.operators.Bucketing.dropTableAndLocation(spark, t + "__graft_cow")
      }
      psql.sql("create table graft_fob_par (k bigint primary key, seg varchar)")
      psql.sql("insert into graft_fob_par " +
        "select id, cast(id % 97 as string) from range(50000)")
      psql.sql("create table graft_fob_chi (id bigint, " +
        "fk bigint references graft_fob_par (k), value double, pad varchar)")
      // build the child with enforcement OFF (native append); every fk
      // lands strictly below 40000, so parent keys >= 45000 stay
      // unreferenced for the DELETE measurements
      val big = events.crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("event_id") * k + col("rep")).as("id"),
          (col("user_id") % 40000).as("fk"), col("value"),
          lpad(col("event_id").cast("string"), 64, "x").as("pad"))
      big.write.mode("append").insertInto("graft_fob_chi")
      val n = spark.table("graft_fob_chi").count()
      // parent-side DELETE of one unreferenced key: OFF vs ON pay the same
      // parent COW rewrite; ON adds the child FK-column semi-probe
      val delOff = timed(psql.sql("delete from graft_fob_par where k = 45001"))
      psql.sql("set graft_enforce_foreign_keys = true")
      val delOn = timed(psql.sql("delete from graft_fob_par where k = 45002"))
      psql.sql("reset graft_enforce_foreign_keys")
      // child-side INSERT of a fixed valid 10k batch: ON adds the anti
      // join against the PARENT's key column (flat in child size)
      big.limit(10000)
        .select((col("id") + lit(900000000L)).as("id"), col("fk"),
          col("value"), col("pad"))
        .createOrReplaceTempView("graft_fob_batch")
      val insOff = timed(psql.sql(
        "insert into graft_fob_chi select * from graft_fob_batch"))
      psql.sql("set graft_enforce_foreign_keys = true")
      val insOn = timed(psql.sql(
        "insert into graft_fob_chi select * from graft_fob_batch"))
      psql.sql("reset graft_enforce_foreign_keys")
      println(f"$k%5d | $n%10d | $delOff%9.2f | $delOn%8.2f | ${delOn - delOff}%11.2f" +
        f" | $insOff%9.2f | $insOn%8.2f | ${insOn - insOff}%11.2f")
    }
    Seq("graft_fob_par", "graft_fob_chi").foreach(
      graft.operators.Bucketing.dropTableAndLocation(spark, _))
    spark.stop()
  }
}
