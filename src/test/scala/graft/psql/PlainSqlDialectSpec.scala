package graft.psql

import graft.SparkSpec

/** The DuckDB expression dialect on PLAIN (non-pipe) statements through the
  * library path. In the reference, plain SQL executes on DuckDB itself —
  * `SELECT x[1]`, `* EXCLUDE`, `DISTINCT ON`, QUALIFY, comprehensions,
  * `{…}` structs, SIMILAR TO/GLOB, `^` = power all carry DuckDB semantics
  * with or without pipes. [[Psql.rewriteOnly]] routes query-headed plain
  * statements through the same shims pipe stages get, so both spellings of
  * a query behave identically. Every expected value here was pinned against
  * DuckDB 1.0.0 on the same parquet (sf0.001).
  *
  * The INJECTED PARSER keeps its narrower strictly-additive contract (pipes
  * / FROM-first / COPY only) — plain SQL there is host-session dialect,
  * exactly the reference's pass-through posture (psql_extension.cpp:76-79).
  */
class PlainSqlDialectSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.Tables.register(spark, "/root/testdata/sf0.001")
  }

  private def rows(q: String): Seq[Seq[Any]] =
    psql.sql(q).collect().toSeq.map(r => (0 until r.length).map(r.get))

  test("star EXCLUDE in a plain statement") {
    val r = rows("SELECT * EXCLUDE (r_name) FROM region ORDER BY r_regionkey")
    assert(r == Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
  }

  test("star REPLACE in a plain statement orders by the REPLACED value") {
    val r = rows("SELECT * REPLACE (upper(r_name) AS r_name) FROM region ORDER BY r_name DESC LIMIT 2")
    assert(r == Seq(Seq(4, "MIDDLE EAST"), Seq(3, "EUROPE")))
  }

  test("DISTINCT ON in a plain statement (Postgres pick semantics)") {
    val r = rows("SELECT DISTINCT ON (l_returnflag) l_returnflag, l_orderkey FROM lineitem ORDER BY l_returnflag, l_orderkey")
    assert(r == Seq(Seq("A", 0L), Seq("N", 0L), Seq("R", 1L)))
  }

  test("DISTINCT ON with WHERE, DESC pick order, and LIMIT") {
    val r = rows("SELECT DISTINCT ON (l_returnflag) l_returnflag, l_orderkey, l_quantity FROM lineitem " +
      "WHERE l_quantity > 10 ORDER BY l_returnflag, l_quantity DESC, l_orderkey LIMIT 2")
    assert(r == Seq(Seq("A", 92L, 50.0), Seq("N", 3L, 50.0)))
  }

  test("DISTINCT ON under a WITH prefix") {
    val r = rows("WITH t AS (SELECT l_returnflag, l_orderkey FROM lineitem) " +
      "SELECT DISTINCT ON (l_returnflag) l_returnflag, l_orderkey FROM t ORDER BY l_returnflag, l_orderkey")
    assert(r == Seq(Seq("A", 0L), Seq("N", 0L), Seq("R", 1L)))
  }

  test("QUALIFY as a plain-statement clause") {
    val r = rows("SELECT l_orderkey, row_number() OVER (ORDER BY l_orderkey) AS rn FROM lineitem QUALIFY rn <= 2")
    assert(r == Seq(Seq(0L, 1L), Seq(0L, 2L)))
  }

  test("QUALIFY over an aggregated select (window on the aggregate)") {
    val r = rows("SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag " +
      "QUALIFY rank() OVER (ORDER BY sum(l_quantity) DESC) = 1")
    assert(r == Seq(Seq("N", 53170.0)))
  }

  test("COLUMNS('re') regex star-expansion in a plain statement") {
    val df = psql.sql("SELECT COLUMNS('r_.*') FROM region ORDER BY r_regionkey LIMIT 1")
    assert(df.columns.toSeq == Seq("r_regionkey", "r_name"))
    assert(df.collect().head.get(0) == 0)
  }

  test("1-based subscripts, negative from-end, and slices") {
    val r = rows("SELECT ([10,20,30])[1] AS s, ([10,20,30])[-1] AS e")
    assert(r == Seq(Seq(10, 30)))
    val s = psql.sql("SELECT ([1,2,3,4])[2:3] AS s").collect().head.getSeq[Int](0)
    assert(s == Seq(2, 3))
  }

  test("string-literal subscripts and slices (DuckDB character semantics)") {
    assert(rows("SELECT 'hello'[2:4] AS s") == Seq(Seq("ell")))
    // quote-escape inside the literal: 'it''s'[4] is the quote char itself
    assert(rows("SELECT 'hello'[1] AS c, 'it''s'[4] AS q") == Seq(Seq("h", "s")))
  }

  test("list comprehension, struct literal + dot access") {
    assert(psql.sql("SELECT [x * 2 FOR x IN [1,2,3] IF x > 1] AS l")
      .collect().head.getSeq[Int](0) == Seq(4, 6))
    assert(rows("SELECT {'a': 1, 'b': 2}.a AS a") == Seq(Seq(1)))
  }

  test("SIMILAR TO (verbatim-regex, full match) and GLOB in plain WHERE") {
    val sim = rows("SELECT r_name FROM region WHERE r_name SIMILAR TO 'A.*' ORDER BY 1")
    assert(sim == Seq(Seq("AFRICA"), Seq("AMERICA"), Seq("ASIA")))
    val gl = rows("SELECT r_name FROM region WHERE r_name GLOB 'A*' ORDER BY 1")
    assert(gl == sim)
  }

  test("zero-arg count(), // and ** and ^ arithmetic, :: casts") {
    assert(rows("SELECT count() FROM region") == Seq(Seq(5L)))
    // ^ is POWER in DuckDB (Spark would XOR) — pinned: (3, 8.0, 8.0)
    assert(rows("SELECT 7 // 2 AS a, 2 ** 3 AS b, 2 ^ 3 AS c") == Seq(Seq(3L, 8.0, 8.0)))
    assert(rows("SELECT '42'::INTEGER AS i") == Seq(Seq(42)))
  }

  test("set operations and GROUP BY ALL keep working through the routed path") {
    val u = rows("SELECT r_name FROM region UNION ALL SELECT n_name FROM nation ORDER BY 1 LIMIT 3")
    assert(u.length == 3 && u.head == Seq("AFRICA"))
    val g = rows("SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem GROUP BY ALL ORDER BY 1")
    assert(g.map(_.head) == Seq("A", "N", "R"))
  }

  test("DISTINCT ON on a union branch scopes to that branch (DuckDB parity)") {
    // splitSetOps cuts the statement at the top-level UNION first, so the
    // DISTINCT ON rewrite applies to its own select block only — exactly
    // DuckDB's scoping (pinned: [(1), (2)])
    val r = rows("SELECT DISTINCT ON (x) x FROM (SELECT 1 AS x) UNION ALL SELECT 2")
    assert(r.map(_.head).toSet == Set(1, 2))
  }

  test("DISTINCT ON + GROUP BY throws the stage-parity error (documented divergence)") {
    // DuckDB evaluates DISTINCT ON over the grouped output; the stage
    // contract here is an explicit error pointing at the subquery spelling
    val e = intercept[IllegalArgumentException] {
      psql.sql("SELECT DISTINCT ON (l_returnflag) l_returnflag FROM lineitem GROUP BY l_returnflag")
    }
    assert(e.getMessage.contains("DISTINCT ON"), e.getMessage)
  }

  test("dialect applies inside CTAS bodies (create routed)") {
    psql.sql("CREATE OR REPLACE TEMP VIEW plain_dialect_v AS SELECT ([1,2,3])[1] AS one")
    assert(spark.table("plain_dialect_v").collect().head.get(0) == 1)
    spark.catalog.dropTempView("plain_dialect_v")
  }

  test("AT TIME ZONE + timezone(): DuckDB's type-dispatched conversions") {
    // all values pinned against DuckDB 1.0 (bundled ICU), session UTC
    def one(q: String): String =
      psql.sql(q).collect().head.getTimestamp(0).toString
    // naive → instant: interpret the wall time IN the zone
    assert(one("SELECT TIMESTAMP '2024-01-01 00:00:00' AT TIME ZONE 'America/New_York' AS t")
      == "2024-01-01 05:00:00.0")
    // TIMESTAMPTZ literal → wall time in the zone (naive)
    assert(one("SELECT TIMESTAMPTZ '2024-01-01 05:00:00+00' AT TIME ZONE 'America/New_York' AS t")
      == "2024-01-01 00:00:00.0")
    // the chained wall-to-wall conversion alternates to/from (mid-DST-gap
    // instant: 06:30 UTC on the US spring-forward day is 01:30 EST)
    assert(one("SELECT TIMESTAMP '2024-03-10 06:30:00' AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS t")
      == "2024-03-10 01:30:00.0")
    // function spelling dispatches identically (REVERSED arg order vs Spark)
    assert(one("SELECT timezone('America/New_York', TIMESTAMP '2024-01-01 00:00:00') AS t")
      == "2024-01-01 05:00:00.0")
    assert(one("SELECT timezone('America/New_York', TIMESTAMPTZ '2024-01-01 05:00:00+00') AS t")
      == "2024-01-01 00:00:00.0")
    // non-literal operand (cast chain), pipe spelling
    assert(one("from range(1) |> select TIMESTAMP '2024-07-01 12:00:00' AT TIME ZONE 'Europe/Berlin' as t")
      == "2024-07-01 10:00:00.0")
    assert(one("SELECT cast('2024-01-01 00:00:00' as timestamp) AT TIME ZONE 'Asia/Tokyo' AS t")
      == "2023-12-31 15:00:00.0")
    // nested function spelling rewrites innermost-first (the inner wrap is
    // the outer call's awareness marker): Kolkata wall = ts + 5:30
    assert(one("SELECT timezone('Asia/Kolkata', timezone('UTC', TIMESTAMP '2024-01-01 00:00:00')) AS t")
      == "2024-01-01 05:30:00.0")
  }

  test("unnest over lists: select-list generator and FROM-position table form") {
    assert(rows("SELECT unnest([1,2,3]) AS u") == Seq(Seq(1), Seq(2), Seq(3)))
    assert(rows("SELECT u FROM unnest([10,20]) AS t(u)") == Seq(Seq(10), Seq(20)))
    // other select items repeat per generated row (both engines)
    val r = rows("from region |> select r_name, unnest([1,2]) as u |> order by r_name, u limit 4")
    assert(r == Seq(Seq("AFRICA", 1), Seq("AFRICA", 2), Seq("AMERICA", 1), Seq("AMERICA", 2)))
  }

  test("string/list function aliases (all DuckDB-1.0-pinned)") {
    assert(rows("SELECT strpos('hello', 'll') AS p") == Seq(Seq(3)))
    assert(rows("SELECT starts_with('hello','he') AS s, ends_with('hello','lo') AS e, " +
      "suffix('hello','lo') AS sf, prefix('hello','he') AS pf")
      == Seq(Seq(true, true, true, true)))
    assert(psql.sql("SELECT string_to_array('a,b', ',') AS l")
      .collect().head.getSeq[String](0) == Seq("a", "b"))
    assert(psql.sql("SELECT list_reverse_sort([1,3,2]) AS r")
      .collect().head.getSeq[Int](0) == Seq(3, 2, 1))
    // list_unique is a COUNT of distinct non-NULL elements in DuckDB
    assert(rows("SELECT list_unique([1,1,2]) AS n") == Seq(Seq(2)))
  }

  test("hex and binary integer literals") {
    assert(rows("SELECT 0xFF AS v, 0b1010 AS b") == Seq(Seq(255L, 10L)))
    assert(rows("SELECT r_name FROM region WHERE r_regionkey = 0x03") == Seq(Seq("EUROPE")))
    // word-boundary guarded: an identifier containing 0x is untouched
    assert(rows("SELECT 10 AS a0xb") == Seq(Seq(10)))
  }

  test("DISTINCT ON resolves output aliases in the pick/partition (DuckDB rule)") {
    // both pinned against DuckDB 1.0
    assert(rows("select distinct on (r_regionkey % 2) r_regionkey % 2 as par, r_name " +
      "from region order by par, r_name") == Seq(Seq(0, "AFRICA"), Seq(1, "AMERICA")))
    assert(rows("select distinct on (par) r_regionkey % 2 as par, r_name " +
      "from region order by par, r_name desc") == Seq(Seq(0, "MIDDLE EAST"), Seq(1, "EUROPE")))
    // the pipe-STAGE spelling resolves the same way
    assert(rows("from region |> select distinct on (par) r_regionkey % 2 as par, r_name " +
      "order by par, r_name desc") == Seq(Seq(0, "MIDDLE EAST"), Seq(1, "EUROPE")))
  }

  test("ASOF/POSITIONAL JOIN statement spellings lower onto the operator plans") {
    spark.sql("SELECT * FROM (VALUES (1, 10.0), (1, 20.0), (2, 30.0)) v(k, ts)")
      .createOrReplaceTempView("asof_lft")
    spark.sql("SELECT * FROM (VALUES (1, 0.0, 'a'), (1, 15.0, 'b'), (2, 25.0, 'c')) v(k, rts, tag)")
      .createOrReplaceTempView("asof_rgt")
    // backward asof per key — DuckDB-pinned: each left row takes the
    // latest right row at-or-before its ts
    val asof = psql.sql("SELECT * FROM asof_lft l ASOF JOIN asof_rgt r " +
      "ON l.k = r.k AND l.ts >= r.rts ORDER BY ts").collect()
    assert(asof.map(_.getString(3)).toSeq == Seq("a", "b", "c"))
    // positional statement form: row-by-row zip, not a cross join (before
    // r17 Spark parsed POSITIONAL as an alias and silently cross-joined)
    val pos = psql.sql("SELECT r_regionkey, n_name FROM region POSITIONAL JOIN nation LIMIT 3")
      .collect()
    assert(pos.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "NATION_0"), (1, "NATION_1"), (2, "NATION_2")))
    // from-first spelling, with a trailing stage
    assert(psql.sql("from region positional join nation |> limit 2").count() == 2)
  }

  test("unloworable join statements THROW instead of silently mis-joining") {
    val e = intercept[IllegalArgumentException] {
      psql.sql("SELECT * FROM region, nation POSITIONAL JOIN region")
    }
    assert(e.getMessage.contains("composite left side"), e.getMessage)
  }

  test("the injected parser keeps plain SQL in HOST dialect (strictly additive)") {
    // library path: 1-based; vanilla spark.sql: the same text is Spark's
    // 0-based GetArrayItem — proving the routing is the library's, not a
    // session-wide re-dialect
    assert(rows("SELECT (array(10,20,30))[1] AS v") == Seq(Seq(10)))
    assert(spark.sql("SELECT (array(10,20,30))[1] AS v").collect().head.get(0) == 20)
  }
}
