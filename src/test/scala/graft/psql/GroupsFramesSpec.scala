package graft.psql

import graft.SparkSpec

/** GROUPS-mode frames (SQL standard; DuckDB 1.0.0 answers "not implemented
  * yet", Spark has no GROUPS at all — rewritten to RANGE over a hidden
  * dense_rank). Expectations below are DuckDB 1.0.0's output for the
  * equivalent dense_rank + RANGE formulation, hand-checked against the
  * GROUPS definition (peer-group-counting bounds).
  */
class GroupsFramesSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(
      """SELECT * FROM VALUES (1,'a',10),(2,'a',20),(3,'a',20),(4,'a',30),(5,'b',5)
        |AS v(id, g, x)""".stripMargin).createOrReplaceTempView("gft")
  }

  test("GROUPS frames count peer groups; single-bound form; global window") {
    val s = """from gft |>
      |select id,
      |  sum(x) over (partition by g order by x
      |    groups between 1 preceding and current row) as s1,
      |  count(*) over (partition by g order by x
      |    groups between unbounded preceding and 1 preceding) as c1,
      |  avg(x) over (order by x groups 2 preceding) as a1 |>
      |order by id""".stripMargin
    val rows = psql.sql(s).collect().toSeq
    def c(i: Int) = rows.map(r => if (r.isNullAt(i)) null else r.get(i))
    assert(c(1) == Seq(10L, 50L, 50L, 70L, 5L)) // s1
    assert(c(2) == Seq(0L, 1L, 1L, 3L, 0L)) // c1
    assert(c(3) == Seq(7.5, 13.75, 13.75, 20.0, 5.0)) // a1
  }

  test("GROUPS + EXCLUDE GROUP composes (rank peers ARE the peer groups)") {
    val s = """from gft |>
      |select id, sum(x) over (partition by g order by x
      |  groups between 1 preceding and 1 following exclude group) as sx |>
      |order by id""".stripMargin
    assert(psql.sql(s).collect().toSeq.map(r => if (r.isNullAt(1)) null else r.get(1))
      == Seq(40L, 40L, 40L, 40L, null))
  }

  test("one exchange for rank + frame windows; star projection never leaks the rank") {
    val df = psql.sql("""from gft |>
      |select *, sum(x) over (partition by g order by x
      |  groups between 1 preceding and current row) as s1 |>
      |order by id""".stripMargin)
    assert(df.columns.toSeq == Seq("id", "g", "x", "s1"), df.columns.toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"rank and frame windows must share one exchange:\n$plan")
  }

  test("unsupported combos fail loudly; a column named groups is untouched") {
    val e = intercept[IllegalArgumentException] {
      psql.sql("""from gft |> select g, sum(x) over (partition by g order by x
        | groups between 1 preceding and current row) as s
        | group by g""".stripMargin)
    }
    assert(e.getMessage.contains("GROUPS frames cannot be combined"))
    val e2 = intercept[UnsupportedOperationException] {
      PsqlRewriter.rewrite("from gft |> select sum(x) over (groups between 1 preceding and current row) as s")
    }
    assert(e2.getMessage.contains("requires ORDER BY"))
    spark.sql("SELECT 1 AS groups").createOrReplaceTempView("gft_col")
    assert(psql.sql("from gft_col |> select groups |> order by groups").count() == 1)
  }
}

/** FILTER on WINDOW aggregates (DuckDB-legal, Spark-rejected) — rewritten
  * to conditional arguments. Expectations are DuckDB 1.0.0's native
  * window-FILTER output on the identical data.
  */
class WindowFilterSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(
      """SELECT * FROM VALUES (1,'a',10),(2,'a',20),(3,'a',20),(4,'a',30),(5,'b',5)
        |AS v(id, g, x)""".stripMargin).createOrReplaceTempView("wft")
  }

  test("window FILTER folds into the argument: DuckDB parity incl. empty-set NULL/0") {
    val s = """from wft |>
      |select id,
      |  sum(x) filter (where x > 10) over (partition by g order by id
      |    rows between unbounded preceding and current row) as sf,
      |  count(*) filter (where x = 20) over (partition by g) as cf,
      |  avg(x) filter (where x <> 20) over (partition by g) as af |>
      |order by id""".stripMargin
    val rows = psql.sql(s).collect().toSeq
    def c(i: Int) = rows.map(r => if (r.isNullAt(i)) null else r.get(i))
    assert(c(1) == Seq(null, 20L, 40L, 70L, null))
    assert(c(2) == Seq(2L, 2L, 2L, 2L, 0L))
    assert(c(3) == Seq(20.0, 20.0, 20.0, 20.0, 5.0))
  }

  test("FILTER + EXCLUDE compose (filter folds first, then the frame rewrites)") {
    val s = """from wft |>
      |select id, sum(x) filter (where x > 10) over (partition by g order by id
      |  rows between 1 preceding and 1 following exclude current row) as fe |>
      |order by id""".stripMargin
    assert(psql.sql(s).collect().toSeq.map(r => if (r.isNullAt(1)) null else r.get(1))
      == Seq(20L, 20L, 50L, 20L, null))
  }

  test("group-by FILTER untouched (Spark-native); non-null-ignoring agg fails loudly") {
    // no OVER → Spark's own FILTER clause runs (q30's surface)
    val r = psql.sql(
      "from wft |> select g, sum(x) filter (where x > 10) as s group by g |> order by g")
      .collect().map(x => (x.getString(0), if (x.isNullAt(1)) null else x.get(1))).toSeq
    assert(r == Seq(("a", 70L), ("b", null)))
    val e = intercept[UnsupportedOperationException] {
      psql.sql("""from wft |> select first_value(x) filter (where x > 10)
        | over (partition by g order by id) as f""".stripMargin)
    }
    assert(e.getMessage.contains("null-ignoring"))
  }
}

/** DISTINCT aggregates in window position (DuckDB-legal, Spark-rejected) —
  * count(DISTINCT) → size(collect_set) over the same window. Expectations
  * are DuckDB 1.0.0's native output where it can answer; the
  * DISTINCT+FILTER+OVER combination CRASHES DuckDB 1.0.0 with an internal
  * assertion, so that row is pinned against the rewrite's own semantics
  * (hand-computed) — strictly beyond-reference surface.
  */
class WindowDistinctSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(
      """SELECT * FROM VALUES (1,'a',10),(2,'a',20),(3,'a',20),(4,'a',30),(5,'b',5)
        |AS v(id, g, x)""".stripMargin).createOrReplaceTempView("wdt")
  }

  test("count(DISTINCT) over partition and running frame: DuckDB parity") {
    val s = """from wdt |>
      |select id,
      |  count(distinct x) over (partition by g) as cd,
      |  count(distinct x) over (partition by g order by id
      |    rows between unbounded preceding and current row) as cdf,
      |  min(distinct x) over (partition by g order by id
      |    rows between 1 preceding and current row) as mnd |>
      |order by id""".stripMargin
    val rows = psql.sql(s).collect().toSeq
    assert(rows.map(_.getLong(1)) == Seq(3L, 3L, 3L, 3L, 1L)) // cd
    assert(rows.map(_.getLong(2)) == Seq(1L, 2L, 2L, 3L, 1L)) // cdf
    assert(rows.map(_.get(3)) == Seq(10, 10, 20, 20, 5)) // mnd ≡ min
  }

  test("count(DISTINCT) FILTER folds (DuckDB 1.0.0 crashes on this; rewrite answers)") {
    val s = """from wdt |>
      |select id, count(distinct x) filter (where x > 10)
      |  over (partition by g) as cdw |>
      |order by id""".stripMargin
    assert(psql.sql(s).collect().map(_.getLong(1)).toSeq == Seq(2L, 2L, 2L, 2L, 0L))
  }

  test("sum(DISTINCT) in window position fails loudly; group-by DISTINCT stays native") {
    val e = intercept[UnsupportedOperationException] {
      psql.sql("from wdt |> select sum(distinct x) over (partition by g) as s")
    }
    assert(e.getMessage.contains("order-unstable"))
    val r = psql.sql("from wdt |> select g, count(distinct x) as c group by g |> order by g")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("a", 3L), ("b", 1L)))
  }
}

/** DuckDB bracket syntax: 1-based subscripts/slices and list literals.
  * The subscript rewrite is semantics, not sugar: a bare `x[i]` in Spark
  * is 0-based GetArrayItem — passing the text through silently
  * off-by-ones every ported query. Expectations are DuckDB 1.0.0 output.
  */
class BracketSyntaxSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  test("subscripts are 1-based, -1 is last; slices incl. open ends and empty ranges") {
    val r = psql.sql("""from range(1) |>
      |select [10, 20, 30][2] as i2, [10, 20, 30][-1] as last,
      |  [10, 20, 30][1:2] as s12, [10, 20, 30][:2] as sTo2,
      |  [10, 20, 30][2:] as sFrom2, [10, 20, 30][3:1] as sEmpty,
      |  array[1, 2][1] as pgStyle""".stripMargin).collect().head
    assert(r.getInt(0) == 20 && r.getInt(1) == 30)
    assert(r.getSeq[Int](2) == Seq(10, 20))
    assert(r.getSeq[Int](3) == Seq(10, 20))
    assert(r.getSeq[Int](4) == Seq(20, 30))
    assert(r.getSeq[Int](5) == Seq())
    assert(r.getInt(6) == 1)
  }

  test("subscripts chain over expressions; map keys unchanged; strings untouched") {
    val r = psql.sql("""from documents |>
      |select doc_id, string_split(text, ' ')[1] as w1,
      |  string_split(text, ' ')[2:3] as w23 |>
      |order by doc_id |> limit 1""".stripMargin).collect().head
    val words = r.getString(1)
    assert(words.nonEmpty, "1-based [1] must be the FIRST word")
    val m = psql.sql("from range(1) |> select map('a', 7)['a'] as v").collect().head
    assert(m.getInt(0) == 7)
    // brackets inside string literals never rewrite
    val lit = psql.sql("from range(1) |> select 'a[1]' as s").collect().head
    assert(lit.getString(0) == "a[1]")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
  }
}

/** DuckDB percentage limit `LIMIT n%` → row_number/count window pair. */
class PctLimitSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql("SELECT id AS x FROM range(101)").createOrReplaceTempView("plt")
    spark.sql("SELECT id AS x FROM range(7)").createOrReplaceTempView("plt7")
  }

  test("floor semantics match DuckDB: 10% of 101 = 10, 50% of 7 = 3, 0% = 0") {
    assert(psql.sql("from plt |> order by x limit 10%").count() == 10)
    assert(psql.sql("from plt7 |> order by x limit 50%").count() == 3)
    assert(psql.sql("from plt7 |> order by x limit 0%").count() == 0)
    // ordered pick: the FIRST rows under the order
    val got = psql.sql("from plt |> order by x desc limit 10%")
      .collect().map(_.getLong(0)).toSet
    assert(got == (91L to 100L).toSet, got)
  }

  test("a bare `|> limit n%` stage picks under the PREVIOUS stage's order") {
    val a = psql.sql("from plt |> order by x desc |> limit 10%")
      .collect().map(_.getLong(0)).toSet
    assert(a == (91L to 100L).toSet, a)
  }

  test("unsupported combos fail loudly; plain integer LIMIT untouched") {
    val e = intercept[IllegalArgumentException] {
      psql.sql("from plt |> order by x limit 10% offset 5")
    }
    assert(e.getMessage.contains("OFFSET"))
    assert(psql.sql("from plt |> order by x |> limit 10").count() == 10)
  }
}

/** Typed-array brackets (`int[]` casts) and empty list literals. */
class BracketEdgeSpec extends SparkSpec {
  lazy val psql = Psql(spark)
  test("cast(x as int[]) passes through; empty literal [] becomes array()") {
    val r = psql.sql("""from range(1) |>
      |select cast(array(1, 2) as int[]) as a, [] as e, [1, 2][2] as i""".stripMargin)
      .collect().head
    assert(r.getSeq[Int](0) == Seq(1, 2))
    assert(r.getSeq[Any](1) == Seq())
    assert(r.getInt(2) == 2)
  }
}
