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
    SequenceStatements.reset(spark)
  }

  test("nextval advances per OCCURRENCE; currval repeats the last value (probed DuckDB)") {
    psql.sql("create or replace sequence s_a start 10 increment 2")
    // probed: SELECT nextval('s1'), nextval('s1') → (10, 12)
    val r = psql.sql("select nextval('s_a') as a, nextval('s_a') as b").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (10L, 12L))
    val c = psql.sql("select currval('s_a') as c").collect()(0)
    assert(c.getLong(0) == 12L)
  }

  test("EXPLAIN is a READ: it peeks, never advances (DuckDB's EXPLAIN does not execute)") {
    psql.sql("create or replace sequence s_ex start 5 increment 3")
    // EXPLAIN of a nextval statement must not move the counter …
    psql.sql("explain select nextval('s_ex') as v").collect()
    psql.sql("explain select nextval('s_ex') as v, nextval('s_ex') as w").collect()
    // … so the first real nextval still dispenses START
    assert(psql.sql("select nextval('s_ex') as v").collect()(0).getLong(0) == 5L)
    // EXPLAIN between dispenses peeks the NEXT value without advancing
    psql.sql("explain select nextval('s_ex') as v").collect()
    assert(psql.sql("select nextval('s_ex') as v").collect()(0).getLong(0) == 8L)
    // EXPLAIN of currval works even before first use (plan-only literal)
    psql.sql("create or replace sequence s_ex2 start 42")
    psql.sql("explain select currval('s_ex2') as v").collect()
    // … and the executed form still errors, per DuckDB's rule
    val e = intercept[IllegalArgumentException] {
      psql.sql("select currval('s_ex2') as v")
    }
    assert(e.getMessage.contains("has not been used yet"), e.getMessage)
    // EXPLAIN of a per-row FROM statement explains instead of throwing
    // (the executed form keeps the row_number() recipe error)
    psql.sql("explain select nextval('s_ex') as v from range(3)").collect()
    assert(psql.sql("select nextval('s_ex') as v").collect()(0).getLong(0) == 11L)
    psql.sql("drop sequence s_ex")
    psql.sql("drop sequence s_ex2")
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
    SequenceStatements.reset(spark)
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
    SequenceStatements.reset(spark)
    psql.sql("create sequence s_e start 7 increment 3")
    val e = intercept[IllegalArgumentException] { psql.sql("select currval('s_e') as v") }
    assert(e.getMessage.contains("not been used"))
    psql.sql("prepare seqp as select nextval('s_e') as v")
    assert(psql.sql("execute seqp").collect()(0).getLong(0) == 7L)
    assert(psql.sql("execute seqp").collect()(0).getLong(0) == 10L) // re-EXECUTE advances
    psql.sql("deallocate seqp")
  }

  test("PREPARE with leading whitespace is still exempt from inlining (r15 fix)") {
    SequenceStatements.reset(spark)
    psql.sql("create sequence s_ws start 1")
    psql.sql("  \n prepare seqws as select nextval('s_ws') as v")
    assert(psql.sql("execute seqws").collect()(0).getLong(0) == 1L)
    assert(psql.sql("execute seqws").collect()(0).getLong(0) == 2L)
    psql.sql("deallocate seqws")
  }

  test("function-syntax FROM (extract/substring/trim) is not a per-row relation (r15 fix)") {
    SequenceStatements.reset(spark)
    psql.sql("create sequence s_fn start 40 increment 2")
    val r = psql.sql("select nextval('s_fn') as id, " +
      "extract(year from date '2024-03-01') as y, " +
      "substring('abcdef' from 2 for 3) as s, " +
      "trim(leading 'x' from 'xxabc') as t").collect()(0)
    assert(r.getLong(0) == 40L && r.getInt(1) == 2024 &&
      r.getString(2) == "bcd" && r.getString(3) == "abc")
    // a REAL relation FROM still throws with the scalable recipe
    val e = intercept[IllegalArgumentException] {
      psql.sql("select nextval('s_fn') as id, extract(year from date '2024-03-01') as y from range(3)")
    }
    assert(e.getMessage.contains("row_number"))
  }

  test("macro bodies using nextval inline at CALL time (r15 fix)") {
    SequenceStatements.reset(spark)
    psql.sql("create sequence s_m start 100 increment 10")
    psql.sql("create or replace macro graft_seq_m() as nextval('s_m') + 1")
    assert(psql.sql("select graft_seq_m() as v").collect()(0).getLong(0) == 101L)
    assert(psql.sql("select graft_seq_m() as v").collect()(0).getLong(0) == 111L)
  }

  test("bounds + cycle: DuckDB's defaults, parser errors, reached-max/min, wrap (probed)") {
    SequenceStatements.reset(spark)
    // probed: descending without MAXVALUE → parser error naming (-1)
    val e1 = intercept[IllegalArgumentException] {
      psql.sql("create sequence s_b1 start 10 increment -2")
    }
    assert(e1.getMessage.contains("cannot be greater than MAXVALUE (-1)"))
    val e2 = intercept[IllegalArgumentException] {
      psql.sql("create sequence s_b2 start 0 increment 2")
    }
    assert(e2.getMessage.contains("cannot be less than MINVALUE (1)"))
    // probed: START 10 INC -2 MAXVALUE 10 → 10, 8
    psql.sql("create sequence s_b3 start 10 increment -2 maxvalue 10")
    assert(psql.sql("select nextval('s_b3') as a, nextval('s_b3') as b")
      .collect()(0).toSeq == Seq(10L, 8L))
    // probed: START 5 INC 3 MAXVALUE 9 → 5, 8, then reached-max error
    psql.sql("create sequence s_b4 start 5 increment 3 maxvalue 9")
    assert(psql.sql("select nextval('s_b4') as a, nextval('s_b4') as b")
      .collect()(0).toSeq == Seq(5L, 8L))
    val e3 = intercept[IllegalArgumentException] {
      psql.sql("select nextval('s_b4') as v")
    }
    assert(e3.getMessage.contains("""reached maximum value of sequence "s_b4" (9)"""))
    // probed: CYCLE wraps to MINVALUE (default 1): 5, 8, 1
    psql.sql("create sequence s_b5 start 5 increment 3 maxvalue 9 cycle")
    assert(psql.sql("select nextval('s_b5') as a, nextval('s_b5') as b, nextval('s_b5') as c")
      .collect()(0).toSeq == Seq(5L, 8L, 1L))
    // probed: bare INCREMENT -3 defaults to start = maxvalue = -1: -1, -4
    psql.sql("create sequence s_b6 increment -3")
    assert(psql.sql("select nextval('s_b6') as a, nextval('s_b6') as b")
      .collect()(0).toSeq == Seq(-1L, -4L))
  }

  test("sequences are scoped per SparkSession (DuckDB per-connection scoping)") {
    SequenceStatements.reset(spark)
    val other = spark.newSession()
    psql.sql("create sequence s_scope start 1")
    // the sibling session has no such sequence: nextval falls through to
    // Spark's unresolved-function error (everCreated=false fast path), and
    // creating SAME-NAMED state there must not advance or clash with ours
    Psql(other).sql("create sequence s_scope start 500")
    assert(Psql(other).sql("select nextval('s_scope') as v").collect()(0).getLong(0) == 500L)
    assert(psql.sql("select nextval('s_scope') as v").collect()(0).getLong(0) == 1L)
  }
}
