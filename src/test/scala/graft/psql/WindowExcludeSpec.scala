package graft.psql

import graft.SparkSpec

/** Window-frame EXCLUDE rewrite: expectations below are DuckDB 1.0.0's
  * native `EXCLUDE` output on the identical data, captured verbatim (the
  * cross-engine contract the q73 gate row re-checks live at sf scale).
  */
class WindowExcludeSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(
      """SELECT * FROM VALUES (1,'a',10),(2,'a',20),(3,'a',20),(4,'a',30),(5,'b',5)
        |AS v(id, g, x)""".stripMargin).createOrReplaceTempView("wex")
  }

  private def col[T](sql: String, idx: Int): Seq[Any] =
    psql.sql(sql).collect().toSeq.map(r => if (r.isNullAt(idx)) null else r.get(idx))

  test("EXCLUDE CURRENT ROW over a bounded ROWS frame (sum): DuckDB parity incl. empty-frame NULL") {
    val s = """from wex |>
      |select id, sum(x) over (partition by g order by id
      |  rows between 1 preceding and 1 following exclude current row) as s |>
      |order by id""".stripMargin
    assert(col(s, 1) == Seq(20L, 30L, 50L, 20L, null)) // DuckDB: 20,30,50,20,NULL
  }

  test("EXCLUDE CURRENT ROW leave-one-out rolling mean (avg): DuckDB parity") {
    val s = """from wex |>
      |select id, avg(x) over (partition by g order by id
      |  rows between unbounded preceding and current row exclude current row) as a |>
      |order by id""".stripMargin
    assert(col(s, 1) == Seq(null, 10.0, 15.0, 16.666666666666668, null))
  }

  test("EXCLUDE GROUP / TIES over RANGE frames: peer-group arithmetic matches DuckDB") {
    val s = """from wex |>
      |select id,
      |  sum(x) over (partition by g order by x
      |    range between unbounded preceding and current row exclude group) as sg,
      |  sum(x) over (partition by g order by x
      |    range between unbounded preceding and current row exclude ties) as st,
      |  count(*) over (partition by g order by x
      |    range between unbounded preceding and current row exclude group) as cg |>
      |order by id""".stripMargin
    val rows = psql.sql(s).collect().toSeq
    def c(i: Int) = rows.map(r => if (r.isNullAt(i)) null else r.get(i))
    assert(c(1) == Seq(null, 10L, 10L, 50L, null)) // sg
    assert(c(2) == Seq(10L, 30L, 30L, 80L, 5L)) // st
    assert(c(3) == Seq(0L, 1L, 1L, 3L, 0L)) // cg
  }

  test("EXCLUDE NO OTHERS is a pure no-op; default frame EXCLUDE CURRENT ROW") {
    val s = """from wex |>
      |select id,
      |  sum(x) over (partition by g order by id exclude no others) as plain,
      |  count(*) over (partition by g order by id exclude current row) as c |>
      |order by id""".stripMargin
    val rows = psql.sql(s).collect().toSeq
    assert(rows.map(_.getLong(1)) == Seq(10L, 30L, 50L, 80L, 5L))
    assert(rows.map(_.getLong(2)) == Seq(0L, 1L, 2L, 3L, 0L))
  }

  test("exclusion outside the frame is a no-op (frame not containing current row)") {
    val s = """from wex |>
      |select id, sum(x) over (partition by g order by id
      |  rows between 2 preceding and 1 preceding exclude current row) as s |>
      |order by id""".stripMargin
    assert(col(s, 1) == Seq(null, 10L, 30L, 40L, null))
  }

  test("min/max EXCLUDE CURRENT ROW over ROWS frames: frame split matches DuckDB") {
    val s = """from wex |>
      |select id,
      |  min(x) over (partition by g order by id
      |    rows between 1 preceding and 1 following exclude current row) as mn,
      |  max(x) over (partition by g order by id
      |    rows between unbounded preceding and current row exclude current row) as mx,
      |  max(x) over (partition by g order by id
      |    rows between current row and unbounded following exclude current row) as mf |>
      |order by id""".stripMargin
    val rows = psql.sql(s).collect().toSeq
    def c(i: Int) = rows.map(r => if (r.isNullAt(i)) null else r.get(i))
    assert(c(1) == Seq(20, 10, 20, 20, null)) // mn
    assert(c(2) == Seq(null, 10, 20, 20, null)) // mx
    assert(c(3) == Seq(30, 30, 30, null, null)) // mf
  }

  test("unsupported shapes fail loudly, never mis-answer") {
    // min over a RANGE/default frame cannot split around the current row
    val e1 = intercept[UnsupportedOperationException] {
      psql.sql("""from wex |> select min(x) over (partition by g order by id
        | exclude current row) as m""".stripMargin)
    }
    assert(e1.getMessage.contains("needs a ROWS frame"))
    // min with GROUP/TIES is not expressible at all
    val e3 = intercept[UnsupportedOperationException] {
      psql.sql("""from wex |> select min(x) over (partition by g order by x
        | range between unbounded preceding and current row exclude group) as m""".stripMargin)
    }
    assert(e3.getMessage.contains("only EXCLUDE CURRENT ROW"))
    // an aggregate outside the five supported ones
    val e4 = intercept[UnsupportedOperationException] {
      psql.sql("""from wex |> select median(x) over (partition by g order by id
        | rows between 1 preceding and 1 following exclude current row) as m""".stripMargin)
    }
    assert(e4.getMessage.contains("not subtractable"))
    // bounded ROWS frame can split a peer group
    val e2 = intercept[UnsupportedOperationException] {
      psql.sql("""from wex |> select sum(x) over (partition by g order by x
        | rows between 1 preceding and 1 following exclude group) as s""".stripMargin)
    }
    assert(e2.getMessage.contains("peer group"))
  }

  test("peer window rides the same exchange: one shuffle for frame + peer aggregates") {
    val df = psql.sql("""from wex |>
      |select id, sum(x) over (partition by g order by x
      |  range between unbounded preceding and current row exclude group) as sg |>
      |order by id""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected the peer window to reuse the frame window's exchange:\n$plan")
  }

  test("strings and a column literally named exclude are untouched") {
    spark.sql("SELECT 1 AS exclude").createOrReplaceTempView("wex_col")
    assert(psql.sql("from wex_col |> select exclude |> order by exclude").count() == 1)
    val r = psql.sql("from wex |> select 'exclude current row' as s |> limit 1").collect()
    assert(r.head.getString(0) == "exclude current row")
  }
}

/** Named WINDOW specs carrying EXCLUDE/GROUPS/FILTER inline into their
  * OVER references (the per-aggregate rewrites cannot share one spec).
  */
class NamedWindowInlineSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(
      """SELECT * FROM VALUES (1,'a',10),(2,'a',20),(3,'a',20),(4,'a',30),(5,'b',5)
        |AS v(id, g, x)""".stripMargin).createOrReplaceTempView("nwi")
  }

  test("named window with EXCLUDE inlines and rewrites (q-row parity values)") {
    val s = """from nwi |>
      |select id, sum(x) over w as s
      |  window w as (partition by g order by id
      |    rows between 1 preceding and 1 following exclude current row) |>
      |order by id""".stripMargin
    assert(psql.sql(s).collect().toSeq.map(r => if (r.isNullAt(1)) null else r.get(1))
      == Seq(20L, 30L, 50L, 20L, null))
  }

  test("named window with GROUPS frame inlines; two aggregates share one named spec") {
    val s = """from nwi |>
      |select id, sum(x) over w as s, count(*) over w as c
      |  window w as (partition by g order by x
      |    groups between 1 preceding and current row) |>
      |order by id""".stripMargin
    val rows = psql.sql(s).collect().toSeq
    assert(rows.map(_.getLong(1)) == Seq(10L, 50L, 50L, 70L, 5L))
    assert(rows.map(_.getLong(2)) == Seq(1L, 3L, 3L, 3L, 1L))
  }

  test("window FILTER over a named spec inlines; plain named windows stay native") {
    val s = """from nwi |>
      |select id, sum(x) filter (where x > 10) over w as sf
      |  window w as (partition by g order by id
      |    rows between unbounded preceding and current row) |>
      |order by id""".stripMargin
    assert(psql.sql(s).collect().toSeq.map(r => if (r.isNullAt(1)) null else r.get(1))
      == Seq(null, 20L, 40L, 70L, null))
    // no trigger words → the named clause passes through to Spark untouched
    val plain = psql.sql("""from nwi |>
      |select id, sum(x) over w as s
      |  window w as (partition by g order by id) |>
      |order by id""".stripMargin)
    assert(plain.collect().map(_.getLong(1)).toSeq == Seq(10L, 30L, 50L, 80L, 5L))
  }
}
