package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the scale factor
  * in SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  *
  * Results are materialized through the `noop` sink — unlike `count()`,
  * which lets Catalyst prune the whole projection, noop forces every output
  * column to be computed while writing nothing.
  */
object Bench {
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
    // untimed warmup: one real execution per table primes file listings,
    // parquet footers, codegen and JIT before any query is timed
    Tables.register(spark, sfDir)
    Tables.all.foreach(t => spark.table(t).limit(1000).write.format("noop").mode("overwrite").save())
    spark.table("lineitem").groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    // warm-then-time PER QUERY, adjacently: the untimed run janino-compiles
    // the query's generated stages (incl. the AQE-chosen join variants) and
    // warms JIT; timing immediately after keeps those classes in Spark's
    // bounded codegen cache (~100 entries — warming all 50+ queries first
    // would evict the early ones again). The timed run measures steady-state
    // execution, not compiler latency.
    val results = SparkEntry.defs.map { d =>
      try d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      val ok =
        try { d.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] ${d.name}: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      d.name -> (if (ok) sec else -1.0)
    }
    // Locale.ROOT: the output line must be machine-parseable JSON on any JVM
    // default locale (no comma decimal separators)
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
