package graft.psql

import graft.SparkSpec

/** PREPARE/EXECUTE/DEALLOCATE: every rule pinned here was probed on
  * DuckDB 1.0 (see PreparedStatements scaladoc).
  */
class PreparedStatementsSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  private def ready(): Unit = {
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("a", "b")
      .createOrReplaceTempView("graft_prep_t")
  }

  test("positional $n parameters: bind, repeat, re-PREPARE replaces") {
    ready()
    psql.sql("PREPARE gp1 AS from graft_prep_t |> where a >= $1 |> order by a")
    assert(psql.sql("EXECUTE gp1(2)").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // $1 twice binds ONE argument twice (probed: $1::int + $1::int of 4 = 8)
    psql.sql("PREPARE gp2 AS from graft_prep_t |> select $1::int + $1::int as s |> limit 1")
    assert(psql.sql("EXECUTE gp2(4)").collect()(0).getInt(0) == 8)
    // arguments substitute parenthesized: 1+2 as $1 in $1 * 2 is 6, not 5
    psql.sql("PREPARE gp3 AS from graft_prep_t |> select $1 * 2 as s |> limit 1")
    assert(psql.sql("EXECUTE gp3(1 + 2)").collect()(0).getInt(0) == 6)
    // re-PREPARE silently replaces (probed)
    psql.sql("PREPARE gp1 AS from graft_prep_t |> where a < $1 |> order by a")
    assert(psql.sql("EXECUTE gp1(2)").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("named and auto-numbered parameters; string arguments") {
    ready()
    psql.sql("PREPARE gpn AS from graft_prep_t |> where b = $nm")
    assert(psql.sql("EXECUTE gpn(nm := 'y')").collect()(0).getLong(0) == 2L)
    psql.sql("PREPARE gpq AS from graft_prep_t |> where a = ? or b = ? |> order by a")
    assert(psql.sql("EXECUTE gpq(1, 'z')").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("DEALLOCATE removes; unknown/arity errors fail loudly") {
    ready()
    psql.sql("PREPARE gpd AS from graft_prep_t |> where a = $1")
    psql.sql("DEALLOCATE gpd")
    val e1 = intercept[IllegalArgumentException] { psql.sql("EXECUTE gpd(1)") }
    assert(e1.getMessage.contains("does not exist"), e1.getMessage)
    // missing argument for $2
    psql.sql("PREPARE gpa AS from graft_prep_t |> where a >= $1 and a <= $2")
    val e2 = intercept[IllegalArgumentException] { psql.sql("EXECUTE gpa(1)") }
    assert(e2.getMessage.contains("$2"), e2.getMessage)
    // surplus argument is an error, not a silent drop
    psql.sql("PREPARE gpb AS from graft_prep_t |> where a = $1")
    val e3 = intercept[IllegalArgumentException] { psql.sql("EXECUTE gpb(1, 2)") }
    assert(e3.getMessage.contains("unused"), e3.getMessage)
    // unbound named parameter
    psql.sql("PREPARE gpc AS from graft_prep_t |> where b = $nm")
    val e4 = intercept[IllegalArgumentException] { psql.sql("EXECUTE gpc(1)") }
    assert(e4.getMessage.contains("nm"), e4.getMessage)
  }

  test("$n inside string literals is data, not a parameter") {
    ready()
    psql.sql("PREPARE gps AS from graft_prep_t |> select '$1' as lit, $1::int as v |> limit 1")
    val r = psql.sql("EXECUTE gps(7)").collect()(0)
    assert(r.getString(0) == "$1" && r.getInt(1) == 7)
  }
}
