package graft.psql

import graft.SparkSpec

/** Schema-qualified DML targets (DmlStatements.resolveTarget): DuckDB's
  * default-namespace spellings (`main.t`, `memory.main.t`,
  * `spark_catalog.default.t`) normalize onto the bare/default name, and a
  * REAL database qualifier (`CREATE SCHEMA s; INSERT INTO s.t …`) routes
  * through the same constraint-aware lowerings as a bare target —
  * enforcement, upserts, copy-on-write UPDATE/DELETE/MERGE, ALTER. Content
  * probed against DuckDB 1.0 executing the same statements.
  */
class SchemaQualifiedDmlSpec extends SparkSpec {

  private lazy val psql = Psql(spark)

  private def drop(name: String): Unit = {
    graft.operators.Bucketing.dropTableAndLocation(spark, name)
    graft.operators.Bucketing.dropTableAndLocation(spark, name + "__graft_cow")
  }

  test("default-namespace spellings resolve; unknown databases error loudly") {
    assert(DmlStatements.resolveTarget(spark, "plain_t") == "plain_t")
    assert(DmlStatements.resolveTarget(spark, "main.x") == "x")
    assert(DmlStatements.resolveTarget(spark, "memory.main.x") == "x")
    assert(DmlStatements.resolveTarget(spark, "spark_catalog.default.x") == "x")
    assert(DmlStatements.resolveTarget(spark, "default.x") == "x")
    val e = intercept[IllegalArgumentException] {
      DmlStatements.resolveTarget(spark, "no_such_db.x")
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DmlStatements.resolveTarget(spark, "a.b.c.d")
    }
    assert(e2.getMessage.contains("database.table"), e2.getMessage)
  }

  test("main.-qualified DML enforces constraints exactly like the bare name") {
    drop("graft_sq_m")
    psql.sql("create table graft_sq_m (i int primary key, v varchar not null)")
    // the advisor case: a qualified insert must NOT bypass the guards
    val nn = intercept[Exception] {
      psql.sql("insert into main.graft_sq_m values (1, null)")
    }
    assert(nn.getMessage.contains("NOT NULL constraint failed"), nn.getMessage)
    psql.sql("insert into main.graft_sq_m values (1, 'a'), (2, 'b')")
    val pk = intercept[Exception] {
      psql.sql("insert into spark_catalog.default.graft_sq_m values (1, 'dup')")
    }
    assert(pk.getMessage.contains("violates primary key"), pk.getMessage)
    // qualified UPDATE / DELETE / TRUNCATE ride the same lowerings
    assert(psql.sql("update main.graft_sq_m set v = 'z' where i = 2")
      .collect()(0).getLong(0) == 1L)
    assert(psql.sql("delete from main.graft_sq_m where i = 1")
      .collect()(0).getLong(0) == 1L)
    val r = spark.table("graft_sq_m").collect()
    assert(r.length == 1 && r(0).getString(1) == "z")
    psql.sql("truncate main.graft_sq_m")
    assert(spark.table("graft_sq_m").count() == 0)
  }

  test("CREATE SCHEMA + qualified targets: constraints, upsert, COW DML, MERGE") {
    psql.sql("create schema if not exists graft_sq_db")
    drop("graft_sq_db.t")
    psql.sql("create table graft_sq_db.t (i int primary key, v varchar not null, n int default 7)")
    // constraint metadata recorded ON the qualified table
    val c = TableConstraints.load(spark, "graft_sq_db.t")
    assert(c.primaryKey == Seq("i") && c.defaults == Map("n" -> "7"))
    psql.sql("insert into graft_sq_db.t (i, v) values (1, 'a'), (2, 'b')")
    assert(spark.table("graft_sq_db.t").where("n = 7").count() == 2)
    // qualified upsert (ON CONFLICT with inferred/explicit key)
    psql.sql("insert into graft_sq_db.t values (2, 'bb', 9), (3, 'c', 1) " +
      "on conflict (i) do update set v = excluded.v")
    // qualified COW UPDATE + DELETE
    assert(psql.sql("update graft_sq_db.t set n = n + i where i >= 2")
      .collect()(0).getLong(0) == 2L)
    assert(psql.sql("delete from graft_sq_db.t where i = 1")
      .collect()(0).getLong(0) == 1L)
    // constraint props survived the COW swaps
    assert(TableConstraints.load(spark, "graft_sq_db.t").primaryKey == Seq("i"))
    // qualified MERGE
    import spark.implicits._
    Seq((3, 100), (4, 400)).toDF("k", "nv").createOrReplaceTempView("graft_sq_src")
    psql.sql("""merge into graft_sq_db.t using graft_sq_src s on t.i = s.k
      |when matched then update set n = s.nv
      |when not matched then insert values (s.k, 'm', s.nv)""".stripMargin)
    val got = spark.table("graft_sq_db.t").orderBy("i").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((2, "bb", 9), (3, "c", 100), (4, "m", 400)), got)
    // qualified ALTER column rename migrates metadata too
    psql.sql("alter table graft_sq_db.t rename column n to m")
    assert(spark.table("graft_sq_db.t").columns.toSeq == Seq("i", "v", "m"))
    drop("graft_sq_db.t")
    spark.sql("drop schema graft_sq_db")
  }
}
