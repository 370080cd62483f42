package graft.psql

import graft.SparkSpec
import org.apache.spark.sql.Row

/** DuckDB CREATE MACRO semantics (Macros.scala). Every rule asserted here
  * was pinned against DuckDB 1.0 first (see Macros.scala scaladoc);
  * cross-engine equality of a macro-driven query is gate row q83.
  */
class MacrosSpec extends SparkSpec {

  private def freshPsql: Psql = Psql(spark)

  test("scalar macro inlines with parenthesized arguments (precedence safe)") {
    val p = freshPsql
    p.sql("CREATE MACRO twice_t1(x) AS x * 2")
    assert(p.sql("SELECT twice_t1(1 + 2) AS v").collect().toSeq == Seq(Row(6)))
  }

  test("defaulted parameters: positional fills non-defaults, named sets defaults") {
    val p = freshPsql
    p.sql("CREATE MACRO addd_t2(a, b := 5) AS a + b")
    assert(p.sql("SELECT addd_t2(1) AS v, addd_t2(1, b := 10) AS w").collect().toSeq ==
      Seq(Row(6, 11)))
    val e = intercept[IllegalArgumentException](p.sql("SELECT addd_t2(1, 2)"))
    assert(e.getMessage.contains("positional argument"))
  }

  test("macros may call other macros (iterative expansion)") {
    val p = freshPsql
    p.sql("CREATE MACRO net_t3(pr, d) AS pr * (1 - d)")
    p.sql("CREATE MACRO outer_t3(x) AS net_t3(x, 0.5) + x")
    assert(p.sql("SELECT cast(outer_t3(10.0) as double) AS v").collect().toSeq == Seq(Row(15.0)))
  }

  test("recursive macros are rejected at the depth cap, not looped") {
    val p = freshPsql
    p.sql("CREATE MACRO rec_t4(x) AS rec_t4(x)")
    val e = intercept[IllegalArgumentException](p.sql("SELECT rec_t4(1)"))
    assert(e.getMessage.contains("recursive"))
  }

  test("table macro expands to a FROM-able subquery; PSQL pipelines work inside") {
    val p = freshPsql
    // DuckDB column naming: range(n)'s table-form column is `range` (the
    // plain-statement dialect routing makes the body behave as DuckDB
    // would — `id` is Spark's TVF column and resolves in neither engine)
    p.sql("CREATE MACRO nums_t5(n) AS TABLE SELECT range AS r FROM range(n)")
    assert(p.sql("SELECT count(*) AS c FROM nums_t5(3)").collect().toSeq == Seq(Row(3L)))
    p.sql("CREATE MACRO piped_t5(n) AS TABLE (from range(n) |> select range * 2 as d)")
    assert(p.sql("from piped_t5(2) |> select cast(sum(d) as int) as s").collect().toSeq ==
      Seq(Row(2)))
  }

  test("duplicate CREATE errors; OR REPLACE replaces; DROP removes") {
    val p = freshPsql
    p.sql("CREATE MACRO m_t6(x) AS x")
    val e = intercept[IllegalArgumentException](p.sql("CREATE MACRO m_t6(y) AS y"))
    assert(e.getMessage.contains("already exists"))
    p.sql("CREATE OR REPLACE MACRO m_t6(x) AS x * 3")
    assert(p.sql("SELECT m_t6(2) AS v").collect().toSeq == Seq(Row(6)))
    p.sql("DROP MACRO m_t6")
    val e2 = intercept[Exception](p.sql("SELECT m_t6(2) AS v").collect())
    assert(e2.getMessage.toLowerCase.contains("m_t6"))
    val e3 = intercept[IllegalArgumentException](p.sql("DROP MACRO m_t6"))
    assert(e3.getMessage.contains("does not exist"))
  }

  test("names are case-insensitive; strings and qualified names never expand") {
    val p = freshPsql
    p.sql("CREATE MACRO casey_t7(x) AS x + 1")
    assert(p.sql("SELECT CASEY_T7(1) AS v, 'casey_t7(1)' AS s").collect().toSeq ==
      Seq(Row(2, "casey_t7(1)")))
  }

  test("defaults must trail positional parameters") {
    val p = freshPsql
    val e = intercept[IllegalArgumentException](
      p.sql("CREATE MACRO bad_t8(a := 1, b) AS a + b"))
    assert(e.getMessage.contains("defaults"))
  }

  test("parameter tokens do not substitute into function-call positions") {
    val p = freshPsql
    // parameter named `abs` must not rewrite the abs( call inside the body
    p.sql("CREATE MACRO shadow_t9(abs) AS abs + abs(-1)")
    assert(p.sql("SELECT shadow_t9(5) AS v").collect().toSeq == Seq(Row(6)))
  }

  test("macro expansion composes with pipe rewriting and WHERE pushdown") {
    val p = freshPsql
    import spark.implicits._
    Seq((1, 10.0), (2, 50.0), (3, 90.0)).toDF("id", "price").createOrReplaceTempView("mt10")
    p.sql("CREATE MACRO pricey_t10(p) AS p > 40")
    val df = p.sql("from mt10 |> where pricey_t10(price) |> select count() as n")
    assert(df.collect().toSeq == Seq(Row(2L)))
  }
}
