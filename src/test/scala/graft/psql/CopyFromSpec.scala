package graft.psql

import graft.SparkSpec

/** `COPY <table> FROM '<path>' (opts)` — the load direction of the COPY
  * family (reference workflow is CSV-in, README.md:8): rewritten to
  * `INSERT INTO <table> SELECT * FROM <path scan>` with reader options
  * riding a `#graft:` path fragment into [[PathRelations]].
  */
class CopyFromSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-copyfrom").toString

  test("rewrite shape: options become a #graft: fragment; sink form untouched") {
    val r = PsqlRewriter.rewrite("copy t FROM '/x/a.csv' (DELIMITER '|', HEADER false)")
    assert(r.toLowerCase.startsWith("insert into t select * from "), r)
    assert(r.contains("#graft:"), r)
    assert(r.contains("header=false") && r.contains("sep=|"), r)
    // no options → bare path, no fragment
    val r2 = PsqlRewriter.rewrite("copy t from '/x/a.csv'")
    assert(r2 == "INSERT INTO t SELECT * FROM '/x/a.csv'", r2)
    // the sink form still rewrites to INSERT OVERWRITE DIRECTORY
    val r3 = PsqlRewriter.rewrite("copy t to '/x/a.csv' (format csv)")
    assert(r3.startsWith("INSERT OVERWRITE DIRECTORY"), r3)
  }

  test("COPY FROM headered csv: positional insert with widening casts") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name\n1,ann\n2,bob\n")
    spark.sql("DROP TABLE IF EXISTS graft_cf1")
    spark.sql("CREATE TABLE graft_cf1 (id BIGINT, name STRING) USING parquet")
    psql.sql(s"copy graft_cf1 from '$dir/in.csv' (format csv, header)")
    val rows = spark.table("graft_cf1").orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "ann"), (2L, "bob")))
    // a second COPY FROM appends (INSERT INTO semantics, like DuckDB)
    psql.sql(s"copy graft_cf1 from '$dir/in.csv' (format csv, header)")
    assert(spark.table("graft_cf1").count() == 4)
    spark.sql("DROP TABLE IF EXISTS graft_cf1")
  }

  test("COPY FROM with DELIMITER and HEADER false; same path, different options = distinct views") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/pipe.csv"),
      "1|x\n2|y\n")
    spark.sql("DROP TABLE IF EXISTS graft_cf2")
    spark.sql("CREATE TABLE graft_cf2 (id BIGINT, s STRING) USING parquet")
    psql.sql(s"copy graft_cf2 from '$dir/pipe.csv' (DELIMITER '|', HEADER false)")
    val rows = spark.table("graft_cf2").orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x"), (2L, "y")))
    spark.sql("DROP TABLE IF EXISTS graft_cf2")
    // option-set keys the registered view name: two option sets over one
    // path must not collide on a cached view
    val a = PathRelations.viewNameFor(s"$dir/pipe.csv#graft:header=false&sep=|")
    val b = PathRelations.viewNameFor(s"$dir/pipe.csv")
    assert(a != b)
  }

  test("round trip: COPY TO then COPY FROM reproduces the source exactly") {
    val dir = tmpDir()
    spark.sql("SELECT id AS k, concat('v', id) AS v FROM range(10)")
      .createOrReplaceTempView("graft_cf_src")
    psql.sql(s"copy (| from graft_cf_src |> order by k |) to '$dir/rt.csv' (format csv, header)")
    spark.sql("DROP TABLE IF EXISTS graft_cf3")
    spark.sql("CREATE TABLE graft_cf3 (k BIGINT, v STRING) USING parquet")
    psql.sql(s"copy graft_cf3 from '$dir/rt.csv' (format csv, header)")
    val got = spark.table("graft_cf3").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == (0L until 10L).map(i => (i, s"v$i")))
    spark.sql("DROP TABLE IF EXISTS graft_cf3")
  }
}

/** Deterministic `USING SAMPLE hash(frac, key [, seed])` stage. */
class HashSampleSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql("SELECT id FROM range(10000)").createOrReplaceTempView("hs_t")
  }

  test("reproducible: identical row set across runs; ~frac of rows survive") {
    val q = "from hs_t |> using sample hash(10%, id) |> order by id"
    val a = psql.sql(q).collect().map(_.getLong(0)).toSeq
    val b = psql.sql(q).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sample must be retry-stable")
    assert(a.size > 800 && a.size < 1200, s"~10% of 10000 expected, got ${a.size}")
  }

  test("seed changes the sample; fraction form 0.1 ≡ 10%") {
    val s42 = psql.sql("from hs_t |> using sample hash(10%, id, 42)").count()
    val s7 = psql.sql("from hs_t |> using sample hash(10%, id, 7)")
      .collect().map(_.getLong(0)).toSet
    val d42 = psql.sql("from hs_t |> using sample hash(0.1, id)")
      .collect().map(_.getLong(0)).toSet
    assert(d42.size.toLong == s42, "0.1 and 10% must select the identical rows")
    assert(s7 != d42, "different seeds must differ")
  }

  test("combines with WHERE (commutes); TABLESAMPLE path untouched") {
    val q = "from hs_t |> where id % 2 = 0 |> using sample hash(20%, id)"
    val one = psql.sql(q).collect().map(_.getLong(0)).toSet
    val two = psql.sql(
      "from hs_t |> using sample hash(20%, id) |> where id % 2 = 0")
      .collect().map(_.getLong(0)).toSet
    assert(one == two, "hash sampling must commute with a deterministic filter")
    assert(one.forall(_ % 2 == 0))
    // classic TABLESAMPLE still translates (rows-only semantics, q31)
    assert(PsqlRewriter.rewrite("from hs_t |> using sample 5%").contains("TABLESAMPLE"))
  }

  test("predicate is sargable text: pushes to the scan on parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hs").toString
    spark.sql("SELECT id FROM range(1000)").write.parquet(s"$dir/t.parquet")
    val df = psql.sql(s"from '$dir/t.parquet' |> using sample hash(10%, id)")
    // the filter must sit in the scan stage (WholeStageCodegen over
    // FileScan + Filter), not behind an exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hash sample must stay map-side:\n$plan")
  }
}
