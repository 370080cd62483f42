package graft.psql

import graft.SparkSpec
import java.nio.file.Files

/** EXPORT/IMPORT DATABASE round-trips: every managed table of the current
  * database exports as a columnar file + schema/load scripts; IMPORT
  * re-registers them and refuses half-imports; the exported dir ATTACHes.
  */
class ExportStatementSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  test("export managed tables of a scratch database; import round-trips; attach works") {
    val dir = Files.createTempDirectory("graft_exp").toFile.getAbsolutePath
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_expdb")
    spark.sql("DROP DATABASE IF EXISTS graft_impdb CASCADE")
    spark.sql("CREATE DATABASE graft_impdb")
    val prev = spark.catalog.currentDatabase
    try {
      spark.catalog.setCurrentDatabase("graft_expdb")
      spark.sql("DROP TABLE IF EXISTS exp_a")
      spark.sql("DROP TABLE IF EXISTS exp_b")
      Seq((1L, "x"), (2L, "y")).toDF("id", "s")
        .write.mode("overwrite").format("parquet").saveAsTable("exp_a")
      Seq((10L, 1.5), (20L, 2.5)).toDF("k", "v")
        .write.mode("overwrite").format("parquet").saveAsTable("exp_b")
      // a temp view must NOT be exported (DuckDB exports base tables)
      spark.table("exp_a").createOrReplaceTempView("exp_view")
      psql.sql(s"export database '$dir'")
      val files = new java.io.File(dir).list().toSet
      assert(files.contains("exp_a.parquet") && files.contains("exp_b.parquet"),
        files.mkString(","))
      assert(files.contains("schema.sql") && files.contains("load.sql"))
      assert(!files.exists(_.startsWith("exp_view")), "views must not export")
      val schema = Files.readString(new java.io.File(dir, "schema.sql").toPath)
      assert(schema.contains("CREATE TABLE exp_a (id BIGINT, s VARCHAR);"), schema)
      // import into a fresh database
      spark.catalog.setCurrentDatabase("graft_impdb")
      psql.sql(s"import database '$dir'")
      assert(spark.table("exp_a").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x"), (2L, "y")))
      assert(spark.table("exp_b").count() == 2)
      // re-import refuses existing tables BEFORE touching anything
      val e = intercept[IllegalArgumentException](psql.sql(s"import database '$dir'"))
      assert(e.getMessage.contains("already exist"), e.getMessage)
      // the exported layout is attachable (read-only snapshot path)
      psql.sql("detach if exists graft_exp_att")
      psql.sql(s"attach '$dir' as graft_exp_att")
      assert(psql.sql("from graft_exp_att.exp_b |> select count() as n")
        .collect()(0).getLong(0) == 2L)
      psql.sql("detach graft_exp_att")
      // csv format variant
      val dir2 = Files.createTempDirectory("graft_exp_csv").toFile.getAbsolutePath
      spark.catalog.setCurrentDatabase("graft_expdb")
      psql.sql(s"export database '$dir2' (format csv)")
      assert(new java.io.File(dir2).list().toSet.contains("exp_a.csv"))
    } finally {
      spark.catalog.setCurrentDatabase(prev)
      spark.sql("DROP DATABASE IF EXISTS graft_expdb CASCADE")
      spark.sql("DROP DATABASE IF EXISTS graft_impdb CASCADE")
    }
  }

  test("runScript replays an EXPORT's schema.sql + load.sql verbatim") {
    val dir = Files.createTempDirectory("graft_rs").toFile.getAbsolutePath
    spark.sql("DROP DATABASE IF EXISTS graft_rsdb CASCADE")
    spark.sql("CREATE DATABASE graft_rsdb")
    spark.sql("DROP DATABASE IF EXISTS graft_rsdb2 CASCADE")
    spark.sql("CREATE DATABASE graft_rsdb2")
    val prev = spark.catalog.currentDatabase
    try {
      spark.catalog.setCurrentDatabase("graft_rsdb")
      Seq((1L, "a;b"), (2L, "c'; drop") // literals with ; and ' must not split
        ).toDF("id", "s").write.format("parquet").saveAsTable("rs_t")
      psql.sql(s"export database '$dir'")
      val schema = Files.readString(new java.io.File(dir, "schema.sql").toPath)
      val load = Files.readString(new java.io.File(dir, "load.sql").toPath)
      // replay into a FRESH database — the DuckDB import workflow by hand
      spark.catalog.setCurrentDatabase("graft_rsdb2")
      psql.runScript(schema)
      psql.runScript(load)
      assert(spark.table("rs_t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
        == Seq((1L, "a;b"), (2L, "c'; drop")))
      // one combined script works too, and returns the LAST statement's df
      spark.sql("DROP DATABASE IF EXISTS graft_rsdb3 CASCADE")
      spark.sql("CREATE DATABASE graft_rsdb3")
      spark.catalog.setCurrentDatabase("graft_rsdb3")
      val last = psql.runScript(
        schema + "\n" + load + "\nfrom rs_t |> select count(*) as n;")
      assert(last.collect()(0).getLong(0) == 2L)
      // a mid-script failure reports the 1-BASED statement index and text
      val e = intercept[IllegalArgumentException] {
        psql.runScript(
          """create or replace table rs_ok (i bigint) using parquet;
            |insert into rs_ok values (1);
            |insert into rs_missing values (2);
            |insert into rs_ok values (3)""".stripMargin)
      }
      assert(e.getMessage.contains("statement 3 of 4"), e.getMessage)
      assert(e.getMessage.contains("rs_missing"), e.getMessage)
      // statements BEFORE the failure executed (script-shell semantics)
      assert(spark.table("rs_ok").count() == 1L)
    } finally spark.catalog.setCurrentDatabase(prev)
  }

  test("constraint metadata rides schema.sql through EXPORT → IMPORT (r15)") {
    val prev = spark.catalog.currentDatabase
    try {
      spark.sql("DROP DATABASE IF EXISTS graft_expc CASCADE")
      spark.sql("DROP DATABASE IF EXISTS graft_impc CASCADE")
      spark.sql("CREATE DATABASE graft_expc")
      spark.catalog.setCurrentDatabase("graft_expc")
      psql.sql("create table cons_t (i integer primary key, " +
        "v varchar default 'x', n bigint not null, check (n >= 0))")
      psql.sql("insert into cons_t values (1, 'a', 5)")
      val dir = java.nio.file.Files.createTempDirectory("graft_exp_cons")
        .toFile.getAbsolutePath
      psql.sql(s"export database '$dir'")
      // the exported schema.sql spells the constraints in DuckDB types
      val schema = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "schema.sql")), "UTF-8")
      assert(schema.contains("PRIMARY KEY (i)"), schema)
      assert(schema.contains("v VARCHAR DEFAULT 'x'"), schema)
      assert(schema.contains("n BIGINT NOT NULL"), schema)
      assert(schema.contains("CHECK (n >= 0)"), schema)
      // import into a fresh database: the constraints ENFORCE again
      spark.sql("CREATE DATABASE graft_impc")
      spark.catalog.setCurrentDatabase("graft_impc")
      psql.sql(s"import database '$dir'")
      val c = TableConstraints.load(spark, "cons_t")
      assert(c.primaryKey == Seq("i") && c.checks == Seq("n >= 0"))
      assert(c.defaults == Map("v" -> "'x'"))
      val dup = intercept[IllegalArgumentException] {
        psql.sql("insert into cons_t values (1, 'b', 2)")
      }
      assert(dup.getMessage.contains("violates primary key"))
      assert(psql.sql("insert or ignore into cons_t values (1, 'b', 2), (2, 'c', 3)")
        .collect()(0).getLong(0) == 1L)
    } finally {
      spark.catalog.setCurrentDatabase(prev)
      spark.sql("DROP DATABASE IF EXISTS graft_expc CASCADE")
      spark.sql("DROP DATABASE IF EXISTS graft_impc CASCADE")
    }
  }
}
