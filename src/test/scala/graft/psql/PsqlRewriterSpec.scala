package graft.psql

import org.scalatest.funsuite.AnyFunSuite

/** Pure string-level tests for the rewriter (no Spark needed). */
class PsqlRewriterSpec extends AnyFunSuite {

  test("pass-through detection: plain SQL is not psql") {
    assert(!PsqlRewriter.isPsql("SELECT 1"))
    assert(!PsqlRewriter.isPsql("select i || j from t1")) // || is not |>
    assert(PsqlRewriter.isPsql("from t1 |> order by i"))
    assert(PsqlRewriter.isPsql("create table t2 as (| from t1 |)"))
  }

  test("pipe token inside string literal does not split") {
    assert(!PsqlRewriter.isPsql("select ' |> ' as s from t1"))
  }

  test("simple pipe chain rewrites to nested select") {
    val r = PsqlRewriter.rewrite("from t1 |> order by i")
    assert(r == "SELECT * FROM ( SELECT * FROM t1 ) ORDER BY i")
  }

  test("where stage") {
    val r = PsqlRewriter.rewrite("from t1 |> where i > 1")
    assert(r == "SELECT * FROM ( SELECT * FROM t1 ) WHERE i > 1")
  }

  test("|| concat not split (reference psql.test:31-33)") {
    val r = PsqlRewriter.rewrite("from t1 |> select i || ',' || j")
    assert(r == "SELECT i || ',' || j FROM ( SELECT * FROM t1 )")
  }

  test("as alias stage with trailing select (reference psql.test:35-37)") {
    val r = PsqlRewriter.rewrite("from t1 |> select i || ',' || j as bar |> as foo select foo.bar")
    assert(r == "SELECT foo.bar FROM ( SELECT i || ',' || j as bar FROM ( SELECT * FROM t1 ) ) as foo")
  }

  test("select with embedded group by") {
    val r = PsqlRewriter.rewrite("from t |> select k, sum(v) as s group by k")
    assert(r == "SELECT k, sum(v) as s FROM ( SELECT * FROM t ) GROUP BY k")
  }

  test("zero-arg count() becomes count(*)") {
    val r = PsqlRewriter.rewrite("from t |> select count() as ct")
    assert(r.contains("count(*) as ct"))
    // count inside a string is untouched
    val r2 = PsqlRewriter.rewrite("from t |> select 'count()' as s")
    assert(r2.contains("'count()'"))
  }

  test("SIMILAR TO becomes anchored RLIKE with verbatim pattern (DuckDB semantics)") {
    val r = PsqlRewriter.rewrite("from t |> where name similar to 'a.c|x+'")
    assert(r.contains("name rlike '^(?:a.c|x+)$'"), r)
    // NOT stays in place — Spark parses NOT RLIKE
    val r2 = PsqlRewriter.rewrite("from t |> where name not similar to 'ab%'")
    assert(r2.contains("name not rlike '^(?:ab%)$'"), r2)
    // doubled quotes inside the literal survive re-embedding
    val r3 = PsqlRewriter.rewrite("from t |> where name similar to 'o''r.*'")
    assert(r3.contains("rlike '^(?:o''r.*)$'"), r3)
    // inside a string literal: untouched
    val r4 = PsqlRewriter.rewrite("from t |> select 'similar to x' as s")
    assert(r4.contains("'similar to x'"), r4)
    // non-literal right side passes through untouched
    val r5 = PsqlRewriter.rewrite("from t |> where a similar to b")
    assert(r5.contains("similar to b"), r5)
  }

  test("arith operators: ^/** -> power, // -> div (DuckDB probed precedence)") {
    def arith(s: String) = PsqlRewriter.rewriteArith(s)
    assert(arith("a ^ 2") == "power(a, 2)")
    assert(arith("2 ** 3") == "power(2, 3)")
    assert(arith("a // b").split("\\s+").mkString(" ") == "a div b")
    assert(arith("7//2").split("\\s+").mkString(" ") == "7 div 2")
    // unary minus binds tighter than ^ (-2 ^ 2 = 4 in DuckDB)
    assert(arith("select -2 ^ 2") == "select power(-2, 2)")
    // binary minus does NOT get swallowed (3 - 2 ^ 2 = -1)
    assert(arith("3 - 2 ^ 2") == "3 - power(2, 2)")
    // left associativity: 2 ^ 3 ^ 2 = 64
    assert(arith("2 ^ 3 ^ 2") == "power(power(2, 3), 2)")
    // ^ binds tighter than *
    assert(arith("2 * 3 ^ 2") == "2 * power(3, 2)")
    assert(arith("2 ^ 2 * 3") == "power(2, 2) * 3")
    // signed right operand
    assert(arith("2 ^ -1") == "power(2, -1)")
    // postfix chains: calls, casts, subscript results, sci-notation
    assert(arith("count(*) ^ 2") == "power(count(*), 2)")
    assert(arith("x::int ^ 2") == "power(x::int, 2)")
    assert(arith("1e-5 ^ 2") == "power(1e-5, 2)")
    assert(arith("f(a, b) ^ g(c)") == "power(f(a, b), g(c))")
    // parenthesized operands, inner-first resolution
    assert(arith("(2 ^ 3) ^ 2") == "power((power(2, 3)), 2)")
    // strings untouched
    assert(arith("regexp_like(s, '^a//b$')") == "regexp_like(s, '^a//b$')")
    // // at * tier: swap preserves grouping
    assert(arith("2 * 9 // 2").split("\\s+").mkString(" ") == "2 * 9 div 2")
    // end-to-end through the full rewrite
    val r = PsqlRewriter.rewrite("from t |> select l ^ 2 as p, k // 3 as d")
    assert(r.contains("power(l, 2) as p") &&
      r.split("\\s+").mkString(" ").contains("k div 3 as d"), r)
  }

  test("GLOB and ~ / !~ regex operators (DuckDB probed semantics)") {
    // glob: * / ? / [!x] translate; regex metachars are escaped (doubled
    // backslash survives Spark's literal unescape)
    val r = PsqlRewriter.rewrite("from t |> where name glob 'a*[!x]?.c'")
    assert(r.contains("name rlike '^(?:a.*[^x].\\\\.c)$'"), r)
    // NOT GLOB keeps NOT in place
    val r2 = PsqlRewriter.rewrite("from t |> where name not glob '*.tmp'")
    assert(r2.contains("name not rlike '^(?:.*\\\\.tmp)$'"), r2)
    // ~ is FULL-match regex in DuckDB (≡ SIMILAR TO)
    val r3 = PsqlRewriter.rewrite("from t |> where name ~ 'a.c|x'")
    assert(r3.contains("name rlike '^(?:a.c|x)$'"), r3)
    val r4 = PsqlRewriter.rewrite("from t |> where name !~ 'x+'")
    assert(r4.contains("name not rlike '^(?:x+)$'"), r4)
    // unary bitwise NOT passes through (keyword before ~ means unary)
    val r5 = PsqlRewriter.rewrite("from t |> select ~5 as b, a & ~3 as m")
    assert(r5.contains("~5") && r5.contains("~3"), r5)
    // non-literal right side passes through
    val r6 = PsqlRewriter.rewrite("from t |> where a ~ b")
    assert(r6.contains("a ~ b"), r6)
    // glob against a column (non-literal) passes through
    val r7 = PsqlRewriter.rewrite("from t |> where a glob b")
    assert(r7.contains("a glob b"), r7)
  }

  test("dot-call function chaining (DuckDB method syntax)") {
    def dot(s: String) = PsqlRewriter.rewriteDotCalls(s)
    assert(dot("s.upper()") == "upper(s)")
    assert(dot("s.contains('x')") == "contains(s, 'x')")
    // chains resolve left-to-right
    assert(dot("s.upper().lower()") == "lower(upper(s))")
    // qualified column as base: longest prefix is the value expression
    assert(dot("t.s.upper()") == "upper(t.s)")
    // string literal and parenthesized bases (probed in DuckDB)
    assert(dot("'o''r'.upper()") == "upper('o''r')")
    assert(dot("(a || b).trim()") == "trim((a || b))")
    // call-result base
    assert(dot("substr(s, 1, 3).upper()") == "upper(substr(s, 1, 3))")
    // plain qualified columns never match
    assert(dot("select t.col from t") == "select t.col from t")
    // decimals never match
    assert(dot("select 1.5 + x") == "select 1.5 + x")
    // inside a string literal: untouched
    assert(dot("select 'a.b(c)' as s") == "select 'a.b(c)' as s")
    // end-to-end through the full rewrite, composing with arith
    val r = PsqlRewriter.rewrite("from t |> select name.upper() as u, name.len() ^ 2 as l2")
    assert(r.contains("upper(name) as u") && r.contains("power(graft_len(name), 2) as l2"), r)
    // catalog-qualified FUNCTION calls are never dot-calls: a base chain
    // rooted at a function-namespace marker skips the rewrite (the old
    // behavior silently misparsed db.fn(x) → fn(db, x))
    assert(dot("spark_catalog.default.fn(x)") == "spark_catalog.default.fn(x)")
    assert(dot("system.builtin.abs(x)") == "system.builtin.abs(x)")
    // ...and a dot-call ON such a call's result still rewrites
    assert(dot("system.builtin.abs(x).upper()") == "upper(system.builtin.abs(x))")
  }

  test("3-arg date_diff translates to boundary arithmetic; 2-arg passes through") {
    val r = PsqlRewriter.rewrite("from t |> select date_diff('month', a, b) as m")
    assert(r.contains("(year(b) * 12 + month(b)) - (year(a) * 12 + month(a))"), r)
    val r2 = PsqlRewriter.rewrite("from t |> select datediff('hour', a, b) as h")
    assert(r2.contains("/ 3600"), r2)
    // Spark's native 2-arg form stays untouched
    val r3 = PsqlRewriter.rewrite("from t |> select date_diff(a, b) as d")
    assert(r3.contains("date_diff(a, b)"), r3)
    val r4 = PsqlRewriter.rewrite("from t |> select datediff(a, b) as d")
    assert(r4.contains("datediff(a, b)"), r4)
    // unsupported part fails loudly
    val e = intercept[IllegalArgumentException] {
      PsqlRewriter.rewrite("from t |> select date_diff('decade', a, b) as d")
    }
    assert(e.getMessage.contains("boundary-crossing"), e.getMessage)
    // plural part accepted
    val r5 = PsqlRewriter.rewrite("from t |> select date_diff('days', a, b) as d")
    assert(r5.contains("datediff(cast((b) as date), cast((a) as date))"), r5)
  }

  test("regexp_replace: DuckDB first-only 3-arg, flags, RE2 replacement syntax") {
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    val psql = Psql(spark)
    def one(expr: String): Any =
      psql.sql(s"from (select 'aXbXc' as s) t |> select $expr as v").collect()(0).get(0)
    // 3-arg replaces FIRST match only (probed DuckDB)
    assert(one("regexp_replace(s, 'X', '-')") == "a-bXc")
    // 'g' flag is global
    assert(one("regexp_replace(s, 'X', '-', 'g')") == "a-b-c")
    // i flag becomes an inline prefix
    assert(one("regexp_replace(s, 'x', '-', 'gi')") == "a-b-c")
    // RE2 replacement syntax: \1 group ref, $ literal
    assert(one("regexp_replace(s, '(a)(X)', '\\\\2\\\\1', 'g')" ) == "XabXc")
    assert(one("regexp_replace(s, 'X', '$9', 'g')") == "a$9b$9c")
    // unsupported flag fails loudly
    val e = intercept[IllegalArgumentException] {
      psql.sql("from (select 'a' as s) t |> select regexp_replace(s, 'a', 'b', 'q') as v")
    }
    assert(e.getMessage.contains("supported: g, i, s, m"), e.getMessage)
  }

  test("format/printf and the LIKE-operator spellings") {
    val r = PsqlRewriter.rewrite("from t |> select format('{} x {}', a, b) as s")
    assert(r.contains("format_string('%s x %s', a, b)"), r)
    // positional {N} -> %(N+1)$s; braces escape; % doubles
    val r2 = PsqlRewriter.rewrite("from t |> select format('{1}/{0} {{x}} 50%', a, b) as s")
    assert(r2.contains("format_string('%2$s/%1$s {x} 50%%', a, b)"), r2)
    val e = intercept[IllegalArgumentException] {
      PsqlRewriter.rewrite("from t |> select format('{:d}', a) as s")
    }
    assert(e.getMessage.contains("printf"), e.getMessage)
    val r3 = PsqlRewriter.rewrite("from t |> select printf('%d', a) as s")
    assert(r3.contains("format_string('%d', a)"), r3)
    // LIKE-operator spellings: keyword swaps, any right-hand side
    val r4 = PsqlRewriter.rewrite("from t |> where a ~~ '%x%' and b !~~ c and d ~~* '%y%' and e !~~* f")
    assert(r4.contains("a like '%x%'") && r4.contains("b not like c") &&
      r4.contains("d ilike '%y%'") && r4.contains("e not ilike f"), r4)
  }

  test("struct and map literals (DuckDB braces)") {
    def br(s: String) = PsqlRewriter.rewriteBraces(s)
    assert(br("{'a': 1, 'b': 'x'}") == "named_struct('a', 1, 'b', 'x')")
    // nested literals resolve over iterations
    assert(br("{'a': {'b': 1}}") == "named_struct('a', named_struct('b', 1))")
    // MAP prefix → map(); keys may be arbitrary expressions
    assert(br("map {'k': 1, 'j': 2}") == "map('k', 1, 'j', 2)")
    assert(br("MAP {1: 'x'}") == "map(1, 'x')")
    // field access composes
    assert(br("{'a': 1}.a") == "named_struct('a', 1).a")
    // :: casts inside values are not separators
    assert(br("{'a': x::int}") == "named_struct('a', x::int)")
    // function-call values with commas stay whole
    assert(br("{'a': coalesce(x, 0), 'b': 2}") ==
      "named_struct('a', coalesce(x, 0), 'b', 2)")
    // string containing braces untouched
    assert(br("select 'a{1}' as s") == "select 'a{1}' as s")
    // malformed (no separator) passes through
    assert(br("{1, 2}") == "{1, 2}")
    // end-to-end: dot-call on a struct literal field
    val r = PsqlRewriter.rewrite(
      "from t |> select {'n': name, 'u': name.upper()}.u as u")
    assert(r.contains("named_struct('n', name, 'u', upper(name)).u as u"), r)
  }

  test("reader table functions rewrite to #graft: quoted paths") {
    val r = PsqlRewriter.rewrite(
      "from read_csv('/tmp/x.csv', header=true, delim='|') |> select a")
    assert(r.contains("'/tmp/x.csv#graft:format=csv&header=true&sep=|'"), r)
    val r2 = PsqlRewriter.rewrite("from read_parquet('/tmp/x.parquet') |> select a")
    assert(r2.contains("'/tmp/x.parquet#graft:format=parquet'"), r2)
    val r3 = PsqlRewriter.rewrite("from read_json_auto('/tmp/x.jsonl') |> select a")
    assert(r3.contains("'/tmp/x.jsonl#graft:format=json'"), r3)
    // := separator, quote/escape/nullstr mapping
    val r4 = PsqlRewriter.rewrite(
      "from read_csv_auto('/tmp/y.csv', header := false, nullstr='NA') |> select a")
    assert(r4.contains("'/tmp/y.csv#graft:format=csv&header=false&nullValue=NA'"), r4)
    // unsupported option fails loudly, never silently drops
    val e = intercept[IllegalArgumentException] {
      PsqlRewriter.rewrite("from read_csv('/tmp/x.csv', skip=3) |> select a")
    }
    assert(e.getMessage.contains("no Spark reader mapping"), e.getMessage)
    // inside a string literal: untouched
    val r5 = PsqlRewriter.rewrite("from t |> select 'read_csv(x)' as s")
    assert(r5.contains("'read_csv(x)'"), r5)
  }

  test("string subscripts dispatch at bind time (DuckDB probed edges)") {
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    val psql = Psql(spark)
    def one(expr: String): Any =
      psql.sql(s"from (select 'abcde' as s) t |> select $expr as v").collect()(0).get(0)
    assert(one("s[2]") == "b")
    assert(one("s[-1]") == "e")
    assert(one("s[0]") == "")   // DuckDB: 0 gives '', not the first char
    assert(one("s[-9]") == "")  // out-of-range below
    assert(one("s[6]") == "")   // out-of-range above
    assert(one("s[2:4]") == "bcd")
    assert(one("s[2:]") == "bcde")
    assert(one("s[:2]") == "ab")
    assert(one("s[-3:-2]") == "cd")
    assert(one("s[3:-1]") == "cde")
    assert(one("s[-1:3]") == "")
    assert(one("s[4:2]") == "")
    assert(one("s[0:2]") == "ab")
    assert(one("s[-9:2]") == "ab")
    assert(one("s[2:99]") == "bcde")
    assert(one("s[cast(null as int)]") == null)   // NULL index -> NULL
    assert(one("s[2:cast(null as int)]") == null) // NULL bound -> NULL
    // arrays unchanged through the same spellings
    assert(one("(['x','y','z'])[2]") == "y")
    assert(one("(['x','y','z'])[2:3]") == Seq("y", "z"))
    assert(one("(['x','y','z'])[-1]") == "z")
  }

  test("generate_series: table form, scalar form, DuckDB empty edge") {
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    val psql = Psql(spark)
    // FROM position: inclusive, column named generate_series
    val t = psql.sql("from generate_series(1, 7, 2) |> order by generate_series")
      .collect().map(_.getLong(0)).toSeq
    assert(t == Seq(1L, 3L, 5L, 7L))
    // 2-arg default step, join-comma positions untouched semantics
    val t2 = psql.sql("from generate_series(3, 5) |> select count() as n")
      .collect()(0).getLong(0)
    assert(t2 == 3L)
    // scalar position: a LIST (sequence), inclusive
    val s1 = psql.sql("from (select 1 as x) t |> select generate_series(1, 4) as g")
      .collect()(0).getSeq[Long](0)
    assert(s1 == Seq(1L, 2L, 3L, 4L))
    // DuckDB empty edge: direction mismatch is EMPTY, not an error
    val s2 = psql.sql("from (select 1 as x) t |> select generate_series(1, 0) as g")
      .collect()(0).getSeq[Long](0)
    assert(s2 == Seq.empty)
    // negative step
    val s3 = psql.sql("from (select 1 as x) t |> select generate_series(5, 1, -2) as g")
      .collect()(0).getSeq[Long](0)
    assert(s3 == Seq(5L, 3L, 1L))
    // scalar generate_series inside a subquery in the FROM suffix stays scalar
    val r = PsqlRewriter.rewrite(
      "from t |> as l join (select generate_series(1, 3) as g) r on true |> select count() as n")
    assert(!r.contains("as generate_series)"), r)
    // NULL bound/step → NULL list, not [] (DuckDB and Spark sequence agree;
    // the direction guard's NULL predicate must not fall into the [] branch)
    val sn = psql.sql(
      "from (select 1 as x) t |> select generate_series(1, cast(null as int)) as g")
      .collect()(0)
    assert(sn.isNullAt(0), sn)
    val sn2 = psql.sql(
      "from (select 1 as x) t |> select generate_series(cast(null as int), 5) as g")
      .collect()(0)
    assert(sn2.isNullAt(0), sn2)
    val sn3 = psql.sql(
      "from (select 1 as x) t |> select generate_series(1, 5, cast(null as int)) as g")
      .collect()(0)
    assert(sn3.isNullAt(0), sn3)
  }

  test("range(): exclusive stop, table + scalar forms, probed DuckDB edges") {
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    val psql = Psql(spark)
    def lst(expr: String): Seq[Long] =
      psql.sql(s"from (select 1 as x) t |> select $expr as g")
        .collect()(0).getSeq[Long](0)
    // probed on DuckDB 1.0: range(5)=[0..4], range(2,5)=[2,3,4],
    // range(5,2,-1)=[5,4,3], range(8,1,-3)=[8,5,2], range(2,2)=[],
    // range(5,2)=[], range(1,5,0)=[]
    assert(lst("range(5)") == Seq(0L, 1L, 2L, 3L, 4L))
    assert(lst("range(2, 5)") == Seq(2L, 3L, 4L))
    assert(lst("range(5, 2, -1)") == Seq(5L, 4L, 3L))
    assert(lst("range(8, 1, -3)") == Seq(8L, 5L, 2L))
    assert(lst("range(2, 2)") == Seq.empty)
    assert(lst("range(5, 2)") == Seq.empty)
    assert(lst("range(1, 5, 0)") == Seq.empty)
    // Long-extreme stops: the exclusive→inclusive bound adjustment must
    // NOT wrap (range(x, Long.MinValue) ascending is [], not a 2^64
    // sequence; descending to Long.MaxValue likewise)
    assert(lst("range(0, -9223372036854775807 - 1)") == Seq.empty)
    assert(lst("range(0, -9223372036854775807 - 1, 1)") == Seq.empty)
    assert(lst("range(0, 9223372036854775807, -1)") == Seq.empty)
    // ...but a genuine descent TO the (excluded) minimum still works —
    // stop+1 = MinValue+1 does not wrap
    assert(lst("range(-9223372036854775804, -9223372036854775807 - 1, -2)")
      == Seq(-9223372036854775804L, -9223372036854775806L))
    // NULL bound → NULL (same guard as generate_series)
    val rn = psql.sql(
      "from (select 1 as x) t |> select range(cast(null as int), 5) as g").collect()(0)
    assert(rn.isNullAt(0), rn)
    // 1-arg generate_series is INCLUSIVE: generate_series(3)=[0,1,2,3]
    assert(lst("generate_series(3)") == Seq(0L, 1L, 2L, 3L))
    // table form: column is named range, stop excluded
    val t = psql.sql("from range(2, 11, 4) |> order by range")
      .collect().map(_.getLong(0)).toSeq
    assert(t == Seq(2L, 6L, 10L))
    // a column named range is NOT a function call; RANGE frames untouched
    val c = psql.sql("from range(3) |> select range * 10 as v |> order by v")
      .collect().map(_.getLong(0)).toSeq
    assert(c == Seq(0L, 10L, 20L))
    val w = psql.sql("""from range(3) |> select cast(sum(range) over
      |(order by range range between 1 preceding and current row) as long) as s
      ||> order by s""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(w == Seq(0L, 1L, 3L))
  }

  test("cast semantics: DuckDB rounding/grammar for integer+boolean targets") {
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    val psql = Psql(spark)
    def one(expr: String): Any =
      psql.sql(s"from (select 1 as x) t |> select $expr as v").collect()(0).get(0)
    // DOUBLE → int: half-even (probed: 2.5::DOUBLE → 2, 3.5 → 4, -2.5 → -2)
    assert(one("cast(cast(2.5 as double) as int)") == 2)
    assert(one("cast(cast(3.5 as double) as int)") == 4)
    assert(one("cast(cast(-2.5 as double) as int)") == -2)
    assert(one("cast(cast(3.7 as double) as int)") == 4)
    // DECIMAL → int: half away from zero (probed: 2.5 → 3, -2.5 → -3)
    assert(one("cast(2.5 as int)") == 3)
    assert(one("cast(-2.5 as int)") == -3)
    // STRING → int: DuckDB grammar (probed: '3.9' → 4, '.5' → 1,
    // '1e3' → 1000, '0x1A' → 26, '0b101' → 5, '1_000' → 1000, trim ok)
    assert(one("cast('3.9' as int)") == 4)
    assert(one("cast('.5' as int)") == 1)
    assert(one("cast('-4.5' as int)") == -5)
    assert(one("cast('1e3' as int)") == 1000)
    assert(one("cast('0x1A' as int)") == 26)
    assert(one("cast('0b101' as int)") == 5)
    assert(one("cast('1_000' as int)") == 1000)
    assert(one("cast('  42  ' as bigint)") == 42L)
    // TRY versions NULL the failures (probed: '-0x10', 'abc', overflow,
    // '12,3', '_1', '1__0' all NULL; '9223372036854775808' overflows)
    assert(one("try_cast('-0x10' as int)") == null)
    assert(one("try_cast('abc' as int)") == null)
    assert(one("try_cast('12,3' as int)") == null)
    assert(one("try_cast('_1' as int)") == null)
    assert(one("try_cast('1__0' as int)") == null)
    assert(one("try_cast('300' as tinyint)") == null)
    assert(one("try_cast('9223372036854775808' as bigint)") == null)
    assert(one("try_cast('9223372036854775807' as bigint)") == Long.MaxValue)
    assert(one("try_cast(cast(1e19 as double) as bigint)") == null)
    assert(one("try_cast(cast('NaN' as double) as int)") == null)
    // strict failures THROW (DuckDB Conversion Error ≙ engine error)
    intercept[Exception] { one("cast('abc' as int)") }
    // BOOLEAN strings: untrimmed member set, case-insensitive (probed:
    // ' true ' and 'yes' are errors where Spark would accept them)
    assert(one("cast('tRuE' as boolean)") == true)
    assert(one("cast('F' as boolean)") == false)
    assert(one("try_cast(' true ' as boolean)") == null)
    assert(one("try_cast('yes' as boolean)") == null)
    // numeric → boolean: nonzero true (delegated; engines agree)
    assert(one("cast(cast(0.4 as double) as boolean)") == true)
    assert(one("cast(0 as boolean)") == false)
    // pass-through targets unaffected; nested casts inside skipped outer
    // casts are still rewritten
    assert(one("cast(cast(2.5 as double) as varchar)") == "2.5")
    assert(one("cast(cast(cast(3.7 as double) as int) as varchar)") == "4")
    // integral sources delegate to plain Cast — identical to before
    assert(one("cast(41 as bigint)") == 41L)
    assert(one("cast(cast(7 as bigint) as int)") == 7)
  }

  test("double-colon casts route to graft_cast — x::int ≡ cast(x AS int)") {
    // rewrite level: target types lower to graft_cast, whitespace allowed
    val r = PsqlRewriter.rewrite("from t |> select x::int as a, y :: bigint as b")
    assert(r.contains("graft_cast(x, 'int')"), r)
    assert(r.contains("graft_cast(y, 'bigint')"), r)
    // chained: the DOUBLE cast's RESULT is cast (DuckDB left-to-right)
    val r2 = PsqlRewriter.rewrite("from t |> select x::double::int as a")
    assert(r2.contains("graft_cast(x::double, 'int')"), r2)
    // non-target and array targets pass through to Spark's native `::`
    val r3 = PsqlRewriter.rewrite("from t |> select x::date as a")
    assert(r3.contains("x::date"), r3)
    // runtime parity: both spellings hit the same DuckDB-semantics kernel
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    val psql = Psql(spark)
    def one(expr: String): Any =
      psql.sql(s"from (select 1 as x) t |> select $expr as v").collect()(0).get(0)
    assert(one("'3.9'::int") == 4)                 // was NULL on Spark's Cast
    assert(one("(1.5 + 2)::double::int") == 4)     // 3.5 half-even (Spark: 3)
    assert(one("2.5::int") == 3)                   // decimal half-away
    assert(one("'0x1A'::int") == 26)
    assert(one("x::bigint") == 1L)
    assert(one("'t'::boolean") == true)
    // grammar extensions: underscores in fractional parts; strict
    // between-digits rule for hex; huge exponents reject early
    assert(one("'1_000.5'::int") == 1001)
    assert(one("try_cast('0x_1A' as int)") == null)
    assert(one("try_cast('0xFF_' as int)") == null)
    assert(one("try_cast('1e2000000000' as int)") == null)
    assert(one("'1e-2000000000'::int") == 0)
    assert(one("'0xF_F'::int") == 255)
    // bare CASE … END::int casts the WHOLE case expression (DuckDB
    // precedence) — the operand is not the END keyword alone; nesting-aware
    assert(one("case when x = 1 then 2.5 else 3.5 end::int") == 3)
    assert(one(
      "case when x = 1 then case when x > 0 then 4.5 else 0 end else 3.5 end::int") == 5)
    // …and the parenthesized spelling stays equivalent
    assert(one("(case when x = 1 then 2.5 else 3.5 end)::int") == 3)
    // machine-generated width: 150 target casts interleaved with 100
    // non-target `::double`s rewrites in ~linear steps (the old
    // restart-from-0 resume made this quadratic into a fixed guard)
    val wide = (1 to 150).map(i => s"x::double::int as c$i") ++
      (1 to 100).map(i => s"x::date as d$i")
    val rWide = PsqlRewriter.rewrite(s"from t |> select ${wide.mkString(", ")}")
    assert(rWide.contains("graft_cast(x::double, 'int') as c150"), "c150 rewritten")
    assert(rWide.contains("x::date as d100"), "dates pass through")
  }

  test("regex-operator patterns keep their backslashes through the rewrite") {
    // DuckDB string literals carry backslashes RAW; the rewritten text is
    // parsed by Spark (escapedStringLiterals=false) which unescapes — the
    // re-embedded pattern must double them or '\d+' silently becomes 'd+'
    val r = PsqlRewriter.rewrite("""from t |> where s ~ '\d+'""")
    assert(r.contains("""rlike '^(?:\\d+)$'"""), r)
    val r2 = PsqlRewriter.rewrite("""from t |> where s similar to '\w\d'""")
    assert(r2.contains("""rlike '^(?:\\w\\d)$'"""), r2)
    val r3 = PsqlRewriter.rewrite("""from t |> where s !~ 'a\.b'""")
    assert(r3.contains("""not rlike '^(?:a\\.b)$'"""), r3)
    // end-to-end: the digit class actually matches digits under Spark
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    val psql2 = Psql(spark)
    spark.sql("select * from (values ('a12'), ('abc')) as v(s)")
      .createOrReplaceTempView("rx_t")
    val got = psql2.sql("""from rx_t |> where s ~ '[a-z]\d+'""")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a12"), got)
    val got2 = psql2.sql("""from rx_t |> where s similar to 'a\w+'""")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(got2 == Seq("a12", "abc"), got2)
  }

  test("strftime/strptime C formats translate to Spark patterns; epoch keeps fraction") {
    val r = PsqlRewriter.rewrite("from t |> select strftime(ts, '%Y-%m-%d %H:%M:%S') as s")
    assert(r.contains("date_format(ts, 'yyyy-MM-dd HH:mm:ss') as s"), r)
    // alphabetic literals get quoted (unquoted T is a pattern letter in Java)
    val r2 = PsqlRewriter.rewrite("from t |> select strftime(ts, '%YT%m') as s")
    assert(r2.contains("date_format(ts, 'yyyy''T''MM') as s"), r2)
    // unpadded variants
    val r3 = PsqlRewriter.rewrite("from t |> select strftime(ts, '%-d/%-m/%Y') as s")
    assert(r3.contains("date_format(ts, 'd/M/yyyy') as s"), r3)
    val r4 = PsqlRewriter.rewrite("from t |> select strptime(s, '%d/%m/%Y') as ts")
    assert(r4.contains("to_timestamp(s, 'dd/MM/yyyy') as ts"), r4)
    // untranslatable code fails loudly
    val e = intercept[IllegalArgumentException] {
      PsqlRewriter.rewrite("from t |> select strftime(ts, '%U') as s")
    }
    assert(e.getMessage.contains("no faithful Spark"), e.getMessage)
    val r5 = PsqlRewriter.rewrite("from t |> select epoch(ts) as e")
    assert(r5.contains("cast(cast((ts) as timestamp) as double) as e"), r5)
    // nesting: inner strptime translated too
    val r6 = PsqlRewriter.rewrite(
      "from t |> select strftime(strptime(s, '%Y'), '%m') as m")
    assert(r6.contains("date_format(to_timestamp(s, 'yyyy'), 'MM') as m"), r6)
  }

  test("scoped block in CTAS (reference psql.test:39-41)") {
    val r = PsqlRewriter.rewrite("create table t2 as (| from t1 |> select i |)")
    assert(r == "create table t2 as ( SELECT i FROM ( SELECT * FROM t1 ) )")
  }

  test("multiple blocks + CTE + union (reference psql.test:43-45)") {
    val r = PsqlRewriter.rewrite(
      "with x as (| from t1 |> as foo |), y as (| from t1 |> as foo |) from x union from y")
    assert(r.contains("with x as ( SELECT * FROM ( SELECT * FROM t1 ) as foo )"))
    assert(r.contains("UNION"))
    assert(r.contains("SELECT * FROM x"))
    assert(r.contains("SELECT * FROM y"))
  }

  test("qualify stage rewrites to filtered window column") {
    val r = PsqlRewriter.rewrite("from t |> select i qualify row_number() over (order by i) = 1")
    assert(r.contains("__qualify__"))
    assert(r.contains("SELECT * EXCEPT (__qualify__)"))
  }

  test("limit + offset") {
    val r = PsqlRewriter.rewrite("from t |> order by i |> limit 5 offset 2")
    assert(r.endsWith("LIMIT 5 OFFSET 2"))
  }

  test("using sample translates to TABLESAMPLE") {
    val r = PsqlRewriter.rewrite("from t |> using sample 10%")
    assert(r.contains("TABLESAMPLE (10 PERCENT)"))
  }

  test("trailing semicolon stripped (reference psql.test:22-23)") {
    val r = PsqlRewriter.rewrite("from t1 |> order by i;")
    assert(r == "SELECT * FROM ( SELECT * FROM t1 ) ORDER BY i")
  }

  test("pipes spanning newlines") {
    val r = PsqlRewriter.rewrite("from t1 |>\n  where i > 1 |>\n  select i")
    assert(r == "SELECT i FROM ( SELECT * FROM ( SELECT * FROM t1 ) WHERE i > 1 )")
  }

  test("set-op EXCEPT vs star-EXCEPT disambiguation") {
    val r = PsqlRewriter.rewrite("from t |> select * except (j)")
    assert(r == "SELECT * except (j) FROM ( SELECT * FROM t )")
    val r2 = PsqlRewriter.rewrite("from a except from b")
    assert(r2 == "SELECT * FROM a EXCEPT SELECT * FROM b")
  }

  test("full README pipeline shape (reference README.md:7-33)") {
    val q =
      """from 'invoices.csv' |>
        |where invoice_date >= date '1970-01-16' |>
        |select *, 0.8 as transaction_fees, total - transaction_fees as income |>
        |where income > 1 |>
        |select customer_id, avg(total), sum(income) as sum_income, count() as ct group by customer_id |>
        |order by sum_income desc |>
        |limit 10 |>
        |as invoices join 'customers.csv' as customers on invoices.customer_id = customers.customer_id |>
        |select customer_id, last_name || ', ' || first_name as name, sum_income""".stripMargin
    val r = PsqlRewriter.rewrite(q)
    assert(r.startsWith("SELECT customer_id, last_name || ', ' || first_name as name, sum_income FROM"))
    assert(r.contains("count(*) as ct"))
    assert(r.contains("GROUP BY customer_id"))
    assert(r.contains("LIMIT 10"))
    assert(r.contains("join 'customers.csv' as customers USING (customer_id)"))
  }

  test("path extraction rewrites FROM/JOIN string literals") {
    val (sqlText, paths) = PathRelations.extractPaths(
      "SELECT * FROM ( SELECT * FROM 'a.csv' ) as l join 'b.csv' as r on l.x = r.x")
    assert(paths.length == 2)
    assert(!sqlText.contains("'a.csv'"))
    assert(!sqlText.contains("'b.csv'"))
    assert(paths.map(_._2).toSet == Set("a.csv", "b.csv"))
    // but a plain string literal elsewhere is untouched
    val (s2, p2) = PathRelations.extractPaths("SELECT 'x.csv' FROM t")
    assert(p2.isEmpty && s2 == "SELECT 'x.csv' FROM t")
  }

  test("nested scoped blocks (beyond reference, README.md:91 limitation lifted)") {
    val r = PsqlRewriter.rewrite("select * from (| from t1 |> where i in (select j from (| from t2 |> select j |)) |)")
    assert(r.contains("FROM t2"))
    assert(r.contains("WHERE i in"))
  }

  test("splitWithPrefix: plain-paren CTE prefixes") {
    assert(PsqlRewriter.splitWithPrefix("with x as (select 1) from x")
      .contains(("with x as (select 1)", " from x")))
    // multiple CTEs, nested parens and a string containing ')'
    val multi = "with a as (select f(')') as s), b as (select 2) from a"
    val Some((pre, rest)) = PsqlRewriter.splitWithPrefix(multi)
    assert(pre == "with a as (select f(')') as s), b as (select 2)" && rest.trim == "from a")
    // not a WITH → None
    assert(PsqlRewriter.splitWithPrefix("select 1").isEmpty)
    assert(PsqlRewriter.isFromFirstWith("with x as (select 1) from x"))
    assert(!PsqlRewriter.isFromFirstWith("with x as (select 1) select * from x"))
  }

  test("plain-paren CTE head rewrites to top-level WITH + SELECT-first tail") {
    val r = PsqlRewriter.rewrite("with x as (select 1 as i) from x |> where i > 0")
    assert(r.startsWith("with x as (select 1 as i)"))
    assert(r.contains("SELECT * FROM"))
    assert(r.toUpperCase.contains("WHERE I > 0"))
  }

  test("topLevelSetOps: detection, modifier spans, star-except and nesting excluded") {
    val one = PsqlRewriter.topLevelSetOps("from a union by name from b")
    assert(one.map(o => (o.op, o.isAll, o.byName)) == Seq(("union", false, true)))
    assert(one.head.pos == "from a ".length)
    assert("from a union by name from b".substring(one.head.end).trim == "from b")
    assert(PsqlRewriter.topLevelSetOps("from a union all by name from b")
      .map(o => (o.op, o.isAll, o.byName)) == Seq(("union", true, true)))
    // mixed chain reported in textual order with per-op flags
    val mixed = PsqlRewriter.topLevelSetOps("from a union by name from b union all from c except from d")
    assert(mixed.map(o => (o.op, o.isAll, o.byName)) ==
      Seq(("union", false, true), ("union", true, false), ("except", false, false)))
    // inside parens → not top level
    assert(PsqlRewriter.topLevelSetOps("from (select 1 union by name select 2)").isEmpty)
    // no left side (leading union is not a set-op)
    assert(PsqlRewriter.topLevelSetOps("union by name from b").isEmpty)
    // select-list `* except (…)` is not a set operation
    assert(PsqlRewriter.topLevelSetOps("select * except (a) from t").isEmpty)
  }

  test("by-name set op in a fragment rejects with a clear error") {
    val e = intercept[IllegalArgumentException] {
      PsqlRewriter.rewrite("with x as (| from a union by name from b |) from x")
    }
    assert(e.getMessage.contains("UNION BY NAME"))
  }

  test("emptyGroupingKeys: clause shapes that do (and don't) need the empty guard") {
    assert(PsqlRewriter.emptyGroupingKeys("rollup(a, b)") == Some(Seq("a", "b")))
    assert(PsqlRewriter.emptyGroupingKeys("CUBE (x)") == Some(Seq("x")))
    assert(PsqlRewriter.emptyGroupingKeys("grouping sets ((a), (a, b), ())") == Some(Seq("a", "b")))
    // no () set → every grouping set has a key → no guard
    assert(PsqlRewriter.emptyGroupingKeys("grouping sets ((a), (b))").isEmpty)
    // plain keys / mixed forms → sets are never empty → no guard
    assert(PsqlRewriter.emptyGroupingKeys("a, b").isEmpty)
    assert(PsqlRewriter.emptyGroupingKeys("a, rollup(b)").isEmpty)
    assert(PsqlRewriter.emptyGroupingKeys("rollup(a), b").isEmpty)
  }

  test("emptyGuardRewrite: keys → NULL, grouping()/grouping_id() → constants, aliases survive") {
    val keys = Seq("a", "b")
    assert(PsqlRewriter.emptyGuardRewrite("a, b, count(*) as c", keys)
      == Some("NULL, NULL, count(*) as c"))
    // qualified reference to a key nulls the WHOLE chain (never `t.NULL`)
    assert(PsqlRewriter.emptyGuardRewrite("t.a, sum(x) as s", keys) == Some("NULL, sum(x) as s"))
    // grouping()/grouping_id() become the ()-set constants
    assert(PsqlRewriter.emptyGuardRewrite("grouping(a) as g, grouping_id(a, b) as gid", keys)
      == Some("1 as g, 3 as gid"))
    // an aggregate ALIASED to a key name keeps its alias
    assert(PsqlRewriter.emptyGuardRewrite("sum(j) as a", keys) == Some("sum(j) as a"))
    // a string literal spelling a key is untouched
    assert(PsqlRewriter.emptyGuardRewrite("'a' as lit, a", keys) == Some("'a' as lit, NULL"))
    // non-identifier keys → no guard (conservative)
    assert(PsqlRewriter.emptyGuardRewrite("a % 2, count(*)", Seq("a % 2")).isEmpty)
  }

  test("list comprehension rewrites to transform") {
    assert(PsqlRewriter.rewriteBrackets("select [x * 2 for x in l] as v") ==
      "select transform(l, x -> x * 2) as v")
  }

  test("list comprehension with IF filters before mapping") {
    assert(PsqlRewriter.rewriteBrackets("select [x * 2 for x in l if x > 1] as v") ==
      "select transform(filter(l, x -> x > 1), x -> x * 2) as v")
  }

  test("comprehension over a literal list resolves over passes") {
    assert(PsqlRewriter.rewriteBrackets("select [x + 1 for x in [1, 2]] as v") ==
      "select transform(array(1, 2), x -> x + 1) as v")
  }

  test("FOR inside a string literal stays a plain list literal") {
    assert(PsqlRewriter.rewriteBrackets("select ['for x in y'] as v") ==
      "select array('for x in y') as v")
  }

  test("comprehension source may be a function call with commas") {
    assert(PsqlRewriter.rewriteBrackets("select [upper(w) for w in string_split(t, ' ')] as v")
      .startsWith("select transform(string_split(t, ' '), w -> upper(w))"))
  }

  test("IGNORE/RESPECT NULLS moves from inside the call (DuckDB) to after it (Spark)") {
    assert(PsqlRewriter.rewriteIgnoreNulls("lag(v ignore nulls) over (order by i)")
      == "lag(v) ignore nulls over (order by i)")
    assert(PsqlRewriter.rewriteIgnoreNulls(
      "first_value(x RESPECT NULLS) over w, lead(y IGNORE NULLS) over w")
      == "first_value(x) RESPECT NULLS over w, lead(y) IGNORE NULLS over w")
    // Spark-spelled text and string literals stay untouched
    assert(PsqlRewriter.rewriteIgnoreNulls("lag(v) ignore nulls over (order by i)")
      == "lag(v) ignore nulls over (order by i)")
    assert(PsqlRewriter.rewriteIgnoreNulls("select 'lag(v ignore nulls)' as s")
      == "select 'lag(v ignore nulls)' as s")
    // r15: an already-Spark-spelled aggregate modifier NESTED in another
    // call (the keyword follows a completed call, before the ENCLOSING
    // close paren) must not be hoisted out of the wrong call
    assert(PsqlRewriter.rewriteIgnoreNulls("coalesce(0, first(x) ignore nulls)")
      == "coalesce(0, first(x) ignore nulls)")
    assert(PsqlRewriter.rewriteIgnoreNulls("f(g(first(x) respect nulls))")
      == "f(g(first(x) respect nulls))")
    // …while the DuckDB in-call spelling nested in another call still moves
    assert(PsqlRewriter.rewriteIgnoreNulls("coalesce(0, first(x ignore nulls))")
      == "coalesce(0, first(x) ignore nulls)")
  }
}
