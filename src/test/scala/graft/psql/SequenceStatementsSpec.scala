package graft.psql

import graft.SparkSpec

/** DuckDB sequences (SequenceStatements): CREATE/DROP forms, per-occurrence
  * nextval/currval inlining in VALUES and FROM-less selects (probed DuckDB
  * shapes), the per-row FROM guard, and catalog errors.
  */
class SequenceStatementsSpec extends SparkSpec {

  private lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    SequenceStatements.reset()
  }

  test("nextval advances per OCCURRENCE; currval repeats the last value (probed DuckDB)") {
    psql.sql("create or replace sequence s_a start 10 increment 2")
    // probed: SELECT nextval('s1'), nextval('s1') → (10, 12)
    val r = psql.sql("select nextval('s_a') as a, nextval('s_a') as b").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (10L, 12L))
    val c = psql.sql("select currval('s_a') as c").collect()(0)
    assert(c.getLong(0) == 12L)
  }

  test("VALUES rows each advance their own occurrence — the surrogate-key insert") {
    psql.sql("create or replace sequence s_b start 1")
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_seq_t")
    psql.sql("create table graft_seq_t as select cast(1 as bigint) as id, 'z' as name where 1 = 0")
    psql.sql("insert into graft_seq_t values (nextval('s_b'), 'a'), (nextval('s_b'), 'b')")
    psql.sql("insert into graft_seq_t values (currval('s_b') + 100, 'c')")
    val got = spark.table("graft_seq_t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (102L, "c")))
  }

  test("per-row nextval over a FROM relation throws with the row_number recipe") {
    psql.sql("create or replace sequence s_c start 1")
    val e = intercept[IllegalArgumentException] {
      psql.sql("select nextval('s_c') from region")
    }
    assert(e.getMessage.contains("row_number"))
  }

  test("catalog rules: duplicate CREATE errors, IF NOT EXISTS keeps, OR REPLACE resets, DROP removes") {
    SequenceStatements.reset()
    psql.sql("create sequence s_d start 5")
    val dup = intercept[IllegalArgumentException] { psql.sql("create sequence s_d") }
    assert(dup.getMessage.contains("already exists"))
    psql.sql("create sequence if not exists s_d start 99") // keeps old
    assert(psql.sql("select nextval('s_d') as v").collect()(0).getLong(0) == 5L)
    psql.sql("create or replace sequence s_d start 100")
    assert(psql.sql("select nextval('s_d') as v").collect()(0).getLong(0) == 100L)
    psql.sql("drop sequence s_d")
    val gone = intercept[IllegalArgumentException] { psql.sql("select nextval('s_d') as v") }
    assert(gone.getMessage.contains("does not exist"))
    psql.sql("drop sequence if exists s_d") // no error
    val dropGone = intercept[IllegalArgumentException] { psql.sql("drop sequence s_d") }
    assert(dropGone.getMessage.contains("does not exist"))
  }

  test("currval before any nextval errors; PREPARE bodies inline at EXECUTE time") {
    SequenceStatements.reset()
    psql.sql("create sequence s_e start 7 increment 3")
    val e = intercept[IllegalArgumentException] { psql.sql("select currval('s_e') as v") }
    assert(e.getMessage.contains("not been used"))
    psql.sql("prepare seqp as select nextval('s_e') as v")
    assert(psql.sql("execute seqp").collect()(0).getLong(0) == 7L)
    assert(psql.sql("execute seqp").collect()(0).getLong(0) == 10L) // re-EXECUTE advances
    psql.sql("deallocate seqp")
  }
}
