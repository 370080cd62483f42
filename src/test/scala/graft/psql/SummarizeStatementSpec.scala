package graft.psql

import graft.SparkSpec

/** DuckDB SUMMARIZE statement — shape and deterministic-value contract
  * (the probed 1.0.0 output: 12 columns, one row per input column in
  * table order, VARCHAR stats, count = total rows).
  */
class SummarizeStatementSpec extends SparkSpec {

  test("summarize <table>: DuckDB shape, table order, exact stats") {
    import spark.implicits._
    Seq((1L, "a", 2.5), (2L, "b", 3.5), (3L, null.asInstanceOf[String], 4.5))
      .toDF("k", "s", "d").createOrReplaceTempView("sumz_t")
    val out = Psql(spark).sql("summarize sumz_t")
    assert(out.columns.toSeq == Seq("column_name", "column_type", "min",
      "max", "approx_unique", "avg", "std", "q25", "q50", "q75", "count",
      "null_percentage"))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k", "s", "d")) // table order
    val k = rows(0)
    assert(k.getString(1) == "BIGINT")
    assert(k.getString(2) == "1" && k.getString(3) == "3")
    assert(k.getLong(10) == 3L)
    assert(k.getDecimal(11).toPlainString == "0.00")
    val s = rows(1)
    assert(s.getString(1) == "VARCHAR")
    // non-numeric: avg/std/quartiles NULL, as DuckDB emits
    assert(s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(7))
    assert(s.getDecimal(11).toPlainString == "33.33")
    val d = rows(2)
    assert(d.getString(1) == "DOUBLE")
    assert(d.getString(5) == "3.5") // avg of 2.5/3.5/4.5
  }

  test("summarize over a query and over a path; single-scan plan") {
    import spark.implicits._
    Seq((1, 10), (2, 20)).toDF("a", "b").createOrReplaceTempView("sumz_q")
    val out = Psql(spark).sql("summarize select a + b as ab from sumz_q")
    val r = out.collect()
    assert(r.length == 1 && r(0).getString(0) == "ab")
    assert(r(0).getString(2) == "11" && r(0).getString(3) == "22")
    // pipeline form re-enters the PSQL front-end
    val out2 = Psql(spark).sql("summarize from sumz_q |> where a > 1")
    assert(out2.collect().map(_.getLong(10)).forall(_ == 1L))
    // one aggregate over one scan: no join, no window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }
}
