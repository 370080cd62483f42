package graft.psql

import graft.SparkSpec

/** DuckDB SET/RESET/PRAGMA option mapping: known options round-trip to
  * spark.conf, unknown options throw DuckDB's message, Spark's dotted
  * conf surface stays native, read-form PRAGMAs return DuckDB shapes.
  */
class SessionOptionsSpec extends SparkSpec {

  private lazy val psql = Psql(spark)

  test("SET threads maps to shuffle partitions; RESET restores the original") {
    val conf = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(conf)
    try {
      psql.sql("set threads = 8")
      assert(spark.conf.get(conf) == "8")
      psql.sql("SET SESSION threads TO 16") // scope + postgres TO spelling
      assert(spark.conf.get(conf) == "16")
      psql.sql("reset threads")
      assert(spark.conf.get(conf) == orig)
      // PRAGMA assignment forms hit the same mapping
      psql.sql("pragma threads = 4")
      assert(spark.conf.get(conf) == "4")
      psql.sql("pragma threads(12)")
      assert(spark.conf.get(conf) == "12")
    } finally spark.conf.set(conf, orig)
  }

  test("SET timezone maps to the session time zone") {
    val conf = "spark.sql.session.timeZone"
    val orig = spark.conf.get(conf)
    try {
      psql.sql("set timezone = 'America/New_York'")
      assert(spark.conf.get(conf) == "America/New_York")
      psql.sql("reset timezone")
      assert(spark.conf.get(conf) == orig)
    } finally spark.conf.set(conf, orig)
  }

  test("unknown option throws DuckDB's message; bad values and unsupported options throw") {
    val e1 = intercept[IllegalArgumentException](psql.sql("set not_an_option = 1"))
    assert(e1.getMessage.contains("unrecognized configuration parameter \"not_an_option\""),
      e1.getMessage)
    val e2 = intercept[IllegalArgumentException](psql.sql("set memory_limit = '4GB'"))
    assert(e2.getMessage.contains("fixed at JVM launch"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](psql.sql("set threads = 'many'"))
    assert(e3.getMessage.contains("invalid value"), e3.getMessage)
    // cosmetic no-ops accepted silently (flag and assignment forms)
    psql.sql("set enable_progress_bar = true")
    psql.sql("pragma enable_progress_bar")
    psql.sql("set preserve_insertion_order = false")
  }

  test("dotted spark confs keep Spark's native SET surface") {
    psql.sql("set spark.sql.ansi.enabled = false")
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
  }

  test("read-form PRAGMAs: version, show_tables, table_info") {
    val v = psql.sql("pragma version")
    assert(v.columns.toSeq == Seq("library_version") && v.count() == 1)
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("graft_opt_t")
    val tables = psql.sql("pragma show_tables").as[String].collect()
    assert(tables.contains("graft_opt_t"), tables.mkString(","))
    val info = psql.sql("pragma table_info('graft_opt_t')").collect()
    assert(info.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((0, "a", "INT"), (1, "b", "STRING")))
  }
}
