package graft.psql

import graft.SparkSpec

/** DuckDB-shaped `DESCRIBE <table>` (DescribeStatement): six columns,
  * DuckDB type spellings, NO/YES null markers, PRI/UNI key flags, default
  * expression text; Spark's own DESCRIBE spellings stay native.
  */
class DescribeStatementSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  test("bare DESCRIBE <table>: DuckDB's probed shape over a constrained table") {
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_desc_t")
    psql.sql("create table graft_desc_t (i integer primary key, " +
      "v varchar default 'x', n bigint not null, u double unique)")
    val rows = psql.sql("describe graft_desc_t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) null else r.getString(4))).toSeq
    // probed DuckDB: [('i','INTEGER','NO','PRI',None), ('v','VARCHAR','YES',None,"'x'"), …]
    assert(rows == Seq(
      ("i", "INTEGER", "NO", "PRI", null),
      ("v", "VARCHAR", "YES", null, "'x'"),
      ("n", "BIGINT", "NO", null, null),
      ("u", "DOUBLE", "YES", "UNI", null)))
  }

  test("temp views describe with schema-derived nullability; complex types spell DuckDB-style") {
    Seq((1L, Seq(1.0, 2.0), "a")).toDF("k", "emb", "s")
      .createOrReplaceTempView("graft_desc_v")
    val rows = psql.sql("describe graft_desc_v").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("k", "BIGINT"), ("emb", "DOUBLE[]"), ("s", "VARCHAR")))
  }

  test("Spark spellings and query forms keep Spark's native shape") {
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_desc_t2")
    psql.sql("create or replace table graft_desc_t2 as select 1 as a")
    val native = psql.sql("describe table graft_desc_t2")
    assert(native.columns.toSeq == Seq("col_name", "data_type", "comment"))
    // DESCRIBE over a pipeline/query also stays native
    val q = psql.sql("describe select a from graft_desc_t2")
    assert(q.columns.contains("col_name"))
  }
}
