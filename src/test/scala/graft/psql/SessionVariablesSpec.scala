package graft.psql

import graft.SparkSpec

/** DuckDB session variables (SessionVariables): eager SET-time evaluation,
  * bind-time getvariable inlining in any query shape, NULL for unset,
  * RESET, type-faithful literals, PREPARE exemption.
  */
class SessionVariablesSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    SessionVariables.clear(spark)
  }

  test("SET evaluates eagerly (subqueries included); getvariable works in FROM queries") {
    Seq((1L, 5.0), (2L, 7.0), (3L, 9.0)).toDF("k", "v")
      .createOrReplaceTempView("graft_var_t")
    psql.sql("set variable vt = (select max(v) from graft_var_t)")
    // later mutations must NOT change the captured value
    Seq((4L, 99.0)).toDF("k", "v").createOrReplaceTempView("graft_var_t")
    val r = psql.sql("select getvariable('vt') as x").collect()(0)
    assert(r.getDouble(0) == 9.0)
    Seq((1L, 8.9), (2L, 9.5)).toDF("k", "v").createOrReplaceTempView("graft_var_u")
    val rows = psql.sql(
      "from graft_var_u |> where v > getvariable('vt') |> select k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("types inline faithfully: string quoting, long, boolean, double repr") {
    psql.sql("set variable vs = 'it''s'")
    psql.sql("set variable vl = 41 + 1")
    psql.sql("set variable vb = 1 < 2")
    psql.sql("set variable vd = cast(0.1 as double) + cast(0.2 as double)")
    val r = psql.sql("select getvariable('vs') as a, getvariable('vl') as b, " +
      "getvariable('vb') as c, getvariable('vd') as d").collect()(0)
    assert(r.getString(0) == "it's")
    assert(r.getInt(1) == 42)
    assert(r.getBoolean(2))
    assert(r.getDouble(3) == 0.1 + 0.2) // exact double round-trip
  }

  test("unset variable is NULL (never an error); RESET returns it to NULL") {
    val r = psql.sql("select getvariable('graft_never_set') as x").collect()(0)
    assert(r.isNullAt(0))
    psql.sql("set variable vres = 5")
    psql.sql("reset variable vres")
    assert(psql.sql("select getvariable('vres') as x").collect()(0).isNullAt(0))
  }

  test("PREPARE bodies bind at EXECUTE time; macro defs at call time") {
    psql.sql("set variable vp = 10")
    psql.sql("prepare varp as select getvariable('vp') as x")
    psql.sql("set variable vp = 20")
    assert(psql.sql("execute varp").collect()(0).getInt(0) == 20)
    psql.sql("deallocate varp")
    psql.sql("create or replace macro graft_vm() as getvariable('vp') + 1")
    psql.sql("set variable vp = 30")
    assert(psql.sql("select graft_vm() as x").collect()(0).getInt(0) == 31)
  }

  test("PREPARE with leading whitespace still binds at EXECUTE time (r15 fix)") {
    psql.sql("set variable vws = 1")
    psql.sql("\n   prepare varws as select getvariable('vws') as x")
    psql.sql("set variable vws = 2")
    assert(psql.sql("execute varws").collect()(0).getInt(0) == 2)
    psql.sql("deallocate varws")
  }

  test("variables are scoped per SparkSession (DuckDB per-connection scoping)") {
    val other = spark.newSession()
    psql.sql("set variable vscope = 'mine'")
    // the sibling session must NOT see it…
    assert(Psql(other).sql("select getvariable('vscope') as x").collect()(0).isNullAt(0))
    // …and its own writes must not leak back
    Psql(other).sql("set variable vscope = 'theirs'")
    assert(psql.sql("select getvariable('vscope') as x").collect()(0).getString(0) == "mine")
  }

  test("computed names and non-scalar values fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      psql.sql("select getvariable('a' || 'b') as x")
    }
    assert(e1.getMessage.contains("string literal"))
    val e2 = intercept[IllegalArgumentException] {
      psql.sql("set variable varr = array(1, 2, 3)")
    }
    assert(e2.getMessage.contains("scalar"))
  }
}
