package graft.psql

import graft.SparkSpec
import java.nio.file.Files

/** ATTACH/DETACH: a directory of columnar tables becomes a catalog
  * namespace; qualified scans resolve through Spark's analyzer; detach
  * drops entries but never data; attached tables are read-only for DML.
  */
class AttachStatementSpec extends SparkSpec {

  private lazy val psql = Psql(spark)

  test("attach a parquet warehouse dir; qualified scans and cross-catalog joins work") {
    psql.sql("detach if exists graft_att_a")
    psql.sql("attach '/root/testdata/sf0.001' as graft_att_a (READ_ONLY)")
    try {
      assert(psql.sql("from graft_att_a.nation |> select count() as n")
        .collect()(0).getLong(0) == 25L)
      // cross-catalog: attached table joined against a session temp view
      spark.read.parquet("/root/testdata/sf0.001/region.parquet")
        .createOrReplaceTempView("graft_att_region")
      val joined = psql.sql("""from graft_att_a.nation |>
        |as n join graft_att_region r on n.n_regionkey = r.r_regionkey |>
        |select r_name, count() as cnt group by r_name |> order by r_name""".stripMargin)
      assert(joined.collect().map(_.getLong(1)).sum == 25L)
      // default-name attach: basename of the path
      psql.sql("detach if exists sf0")
      psql.sql("attach '/root/testdata/sf0.001'")
      assert(spark.catalog.databaseExists("sf0"))
      psql.sql("detach sf0")
    } finally psql.sql("detach if exists graft_att_a")
  }

  test("detach drops the namespace but never the files; DML refuses attached tables") {
    val dir = Files.createTempDirectory("graft_attach").toFile
    val sub = new java.io.File(dir, "tiny")
    import spark.implicits._
    Seq((1, "x"), (2, "y")).toDF("id", "s")
      .write.mode("overwrite").parquet(sub.getAbsolutePath)
    // stray non-table files are skipped, not fatal
    Files.writeString(new java.io.File(dir, "README.txt").toPath, "notes")
    psql.sql("detach if exists graft_att_b")
    psql.sql(s"attach '${dir.getAbsolutePath}' as graft_att_b")
    assert(psql.sql("from graft_att_b.tiny |> select count() as n")
      .collect()(0).getLong(0) == 2L)
    // attached namespaces are read-only → DuckDB's exact wording (probed
    // 1.0 against a (READ_ONLY) attach)
    val e = intercept[IllegalArgumentException] {
      psql.sql("delete from graft_att_b.tiny where id = 1")
    }
    assert(e.getMessage.contains(
      """Cannot execute statement of type "DELETE" on database "graft_att_b" which is attached in read-only mode!"""),
      e.getMessage)
    psql.sql("detach graft_att_b")
    assert(!spark.catalog.databaseExists("graft_att_b"))
    // files survive the detach
    assert(spark.read.parquet(sub.getAbsolutePath).count() == 2L)
    // double-detach errors without IF EXISTS
    val e2 = intercept[IllegalArgumentException](psql.sql("detach graft_att_b"))
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    // duplicate attach errors
    psql.sql(s"attach '${dir.getAbsolutePath}' as graft_att_b")
    val e3 = intercept[IllegalArgumentException](
      psql.sql(s"attach '${dir.getAbsolutePath}' as graft_att_b"))
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
    psql.sql("detach graft_att_b")
  }

  test("csv and json entries register with their formats") {
    val dir = Files.createTempDirectory("graft_attach_fmt").toFile
    Files.writeString(new java.io.File(dir, "people.csv").toPath,
      "id,name\n1,ada\n2,lin\n")
    Files.writeString(new java.io.File(dir, "facts.json").toPath,
      """{"k": 1, "v": "a"}
        |{"k": 2, "v": "b"}""".stripMargin)
    psql.sql("detach if exists graft_att_c")
    psql.sql(s"attach '${dir.getAbsolutePath}' as graft_att_c")
    try {
      assert(psql.sql("from graft_att_c.people |> select count() as n")
        .collect()(0).getLong(0) == 2L)
      assert(psql.sql("from graft_att_c.facts |> select max(k) as m")
        .collect()(0).getLong(0) == 2L)
    } finally psql.sql("detach graft_att_c")
  }

  test("a .duckdb database FILE names the EXPORT DATABASE directory bridge") {
    val e = intercept[IllegalArgumentException](
      psql.sql("attach '/tmp/other.duckdb' as graft_att_d"))
    assert(e.getMessage.contains("EXPORT DATABASE"), e.getMessage)
    assert(e.getMessage.contains("FORMAT PARQUET"), e.getMessage)
    // a path that exists but is a plain FILE gets the same pointer
    val f = java.nio.file.Files.createTempFile("graft_att", ".bin").toFile
    val e2 = intercept[Exception](
      psql.sql(s"attach '${f.getAbsolutePath}' as graft_att_d"))
    assert(e2.getMessage.contains("EXPORT DATABASE"), e2.getMessage)
  }

  test("every write statement type refuses an attached namespace with DuckDB's wording") {
    val dir = Files.createTempDirectory("graft_att_ro").toFile
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "s")
      .write.mode("overwrite").parquet(new java.io.File(dir, "t").getAbsolutePath)
    psql.sql("detach if exists graft_att_ro")
    psql.sql(s"attach '${dir.getAbsolutePath}' as graft_att_ro")
    def refused(stmt: String, tpe: String): Unit = {
      // exception CLASS varies by path (a lowering running inside Spark
      // analysis surfaces as AnalysisException) — the CONTRACT is the text
      val e = intercept[Exception](psql.sql(stmt))
      assert(e.getMessage.contains(
        s"""Cannot execute statement of type "$tpe" on database "graft_att_ro" which is attached in read-only mode!"""),
        s"$stmt → ${e.getMessage}")
    }
    // plain INSERT previously fell through to Spark's NATIVE path, which
    // would append part files into the user's attached directory
    refused("insert into graft_att_ro.t values (3, 'z')", "INSERT")
    refused("insert into graft_att_ro.t select id + 9, s from graft_att_ro.t", "INSERT")
    refused("insert or ignore into graft_att_ro.t values (1, 'x')", "INSERT")
    refused("update graft_att_ro.t set s = 'q' where id = 1", "UPDATE")
    refused("delete from graft_att_ro.t", "DELETE")
    refused("truncate graft_att_ro.t", "DELETE")
    refused("""merge into graft_att_ro.t using (select 1 as id, 'm' as s) src
      |on graft_att_ro.t.id = src.id when matched then update set s = src.s""".stripMargin,
      "MERGE")
    refused("alter table graft_att_ro.t add column extra int", "ALTER")
    refused(s"copy graft_att_ro.t from '${dir.getAbsolutePath}/t'", "INSERT")
    // the data is byte-untouched and still scans
    assert(psql.sql("from graft_att_ro.t |> select count(*) as n")
      .collect()(0).getLong(0) == 2L)
    psql.sql("detach graft_att_ro")
  }

  test("a DIRECTORY named like a database file attaches normally") {
    // the bridge recipe only applies to actual FILES (or missing paths):
    // an exported directory someone named `corpus.db` is a valid attach
    val dir = java.nio.file.Files.createTempDirectory("graft_att_dir").toFile
    val sub = new java.io.File(dir, "corpus.db")
    assert(sub.mkdir())
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(new java.io.File(sub, "t1").getAbsolutePath)
    psql.sql(s"attach '${sub.getAbsolutePath}' as graft_att_dirdb")
    assert(psql.sql("from graft_att_dirdb.t1 |> select count(*) as n")
      .collect()(0).getLong(0) == 2L)
    psql.sql("detach graft_att_dirdb")
  }
}
