package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main (optimization round 18): times each b20-style
  * statement individually so the per-statement driver cost is attributable.
  * Not part of the driver contract; delete when the round closes.
  */
object StmtProbe {
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
    val psql = graft.psql.Psql(spark)
    val stmts = Seq(
      "drop" -> (() => {
        graft.operators.Bucketing.dropTableAndLocation(spark, "graft_b20_t")
        graft.operators.Bucketing.dropTableAndLocation(spark, "graft_b20_t__graft_cow")
      }),
      "create" -> (() => { psql.sql("""create or replace table graft_b20_t (
        |  o_orderkey bigint primary key,
        |  o_custkey bigint not null,
        |  o_orderstatus varchar default 'N',
        |  o_totalprice double,
        |  check (o_totalprice >= 0))""".stripMargin); () }),
      "insert1" -> (() => { psql.sql("""insert into graft_b20_t select o_orderkey, o_custkey,
        |o_orderstatus, o_totalprice from orders where o_orderkey % 5 = 0""".stripMargin); () }),
      "insert2-defaults" -> (() => { psql.sql("""insert into graft_b20_t (o_orderkey, o_custkey, o_totalprice)
        |select o_orderkey + 9000000, o_custkey, o_totalprice from orders
        |where o_orderkey % 11 = 0""".stripMargin); () }),
      "insert-or-replace" -> (() => { psql.sql("""insert or replace into graft_b20_t
        |select o_orderkey, o_custkey, 'R', o_totalprice + 1 from orders
        |where o_orderkey % 10 = 0""".stripMargin); () }),
      "insert-or-ignore" -> (() => { psql.sql("""insert or ignore into graft_b20_t
        |select o_orderkey, o_custkey, 'I', o_totalprice from orders
        |where o_orderkey % 3 = 0""".stripMargin); () }),
      "on-conflict-update" -> (() => { psql.sql("""insert into graft_b20_t select o_orderkey, o_custkey, 'C',
        |o_totalprice from orders where o_orderkey % 7 = 2
        |on conflict do update set
        |  o_totalprice = o_totalprice + excluded.o_totalprice""".stripMargin); () }),
      "final-select" -> (() => {
        spark.table("graft_b20_t").orderBy("o_orderkey")
          .write.format("noop").mode("overwrite").save()
      }))
    // two passes: the second is the warmed one that matches the bench
    for (pass <- 1 to 2) {
      System.err.println(s"=== pass $pass ===")
      stmts.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        System.err.println(f"[$name%-20s] ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
