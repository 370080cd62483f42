package graft.psql

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** DuckDB DELETE/UPDATE statement lowering: DuckDB's probed semantics
  * (Count result shape, NULL-cond three-valued logic, assignment-cast
  * rounding) over the copy-on-write shadow swap.
  */
class DmlStatementsSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  private def seed(name: String): Unit = {
    graft.operators.Bucketing.dropTableAndLocation(spark, name)
    graft.operators.Bucketing.dropTableAndLocation(spark, name + "__graft_cow")
    Seq((1L, Some(10L), "x"), (2L, Some(20L), "y"), (3L, None, "z"))
      .toDF("id", "v", "s")
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(name)
  }

  test("DELETE: Count shape, WHERE semantics, NULL condition keeps the row") {
    seed("graft_dml_t1")
    // v > 15 is NULL for id=3 — DuckDB keeps the row (probed 1.0)
    val r = psql.sql("delete from graft_dml_t1 where v > 15")
    assert(r.columns.toSeq == Seq("Count"))
    assert(r.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val left = spark.table("graft_dml_t1").select("id").as[Long].collect().sorted
    assert(left.toSeq == Seq(1L, 3L))
    // unconditioned DELETE empties the table, Count = remaining rows
    val r2 = psql.sql("delete from graft_dml_t1")
    assert(r2.collect()(0).getLong(0) == 2L)
    assert(spark.table("graft_dml_t1").count() == 0)
    // schema survives the empty rewrite
    assert(spark.table("graft_dml_t1").columns.toSeq == Seq("id", "v", "s"))
  }

  test("UPDATE: matched rows only, NULL condition leaves the row unmodified") {
    seed("graft_dml_t2")
    val r = psql.sql(
      "update graft_dml_t2 set v = v + 1, s = s || '!' where v >= 10")
    assert(r.columns.toSeq == Seq("Count"))
    assert(r.collect()(0).getLong(0) == 2L)
    val rows = spark.table("graft_dml_t2").orderBy("id")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1), x.getString(2)))
    assert(rows.toSeq == Seq((1L, 11L, "x!"), (2L, 21L, "y!"), (3L, -1L, "z")))
  }

  test("UPDATE assignment casts round like DuckDB's (probed: 2.5→3, 3.5 double→4)") {
    seed("graft_dml_t3")
    psql.sql("update graft_dml_t3 set v = 2.5 where id = 1")
    psql.sql("update graft_dml_t3 set v = cast(3.5 as double) where id = 2")
    val vs = spark.table("graft_dml_t3").orderBy("id").collect()
      .map(x => if (x.isNullAt(1)) -1L else x.getLong(1))
    assert(vs.toSeq == Seq(3L, 4L, -1L), vs.mkString(","))
    // dialect features work inside SET/WHERE: :: cast + string grammar
    psql.sql("update graft_dml_t3 set v = '4.9'::bigint where id = 3")
    assert(spark.table("graft_dml_t3").where(col("id") === 3)
      .collect()(0).getLong(1) == 5L)
  }

  test("ALTER TABLE column forms: add/default, rename, retype, using, drop; TRUNCATE") {
    seed("graft_dml_t5")
    // metadata-only ADD (no default): existing rows read NULL, no rewrite
    psql.sql("alter table graft_dml_t5 add column tag varchar")
    assert(spark.table("graft_dml_t5").where(col("tag").isNull).count() == 3)
    // ADD with DEFAULT fills existing rows (probed DuckDB behavior)
    psql.sql("alter table graft_dml_t5 add column k int default 7")
    assert(spark.table("graft_dml_t5").where(col("k") === 7).count() == 3)
    // RENAME keeps position and data
    psql.sql("alter table graft_dml_t5 rename column s to name")
    assert(spark.table("graft_dml_t5").columns.toSeq ==
      Seq("id", "v", "name", "tag", "k"))
    // ALTER TYPE double-ish → int keeps DuckDB rounding (half-even via
    // GraftCast — probed: DuckDB ALTER of 2.5 gives 2, 3.5 gives 4)
    psql.sql("alter table graft_dml_t5 alter column k type varchar using k || 'x'")
    assert(spark.table("graft_dml_t5").select("k").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("7x"))
    // DROP COLUMN
    psql.sql("alter table graft_dml_t5 drop column tag")
    assert(spark.table("graft_dml_t5").columns.toSeq == Seq("id", "v", "name", "k"))
    // TRUNCATE (DuckDB spelling, no TABLE keyword) empties but keeps schema
    psql.sql("truncate graft_dml_t5")
    assert(spark.table("graft_dml_t5").count() == 0)
    assert(spark.table("graft_dml_t5").columns.toSeq == Seq("id", "v", "name", "k"))
    // ALTER TABLE RENAME TO passes through to Spark's native DDL
    psql.sql("alter table graft_dml_t5 rename to graft_dml_t5b")
    assert(spark.table("graft_dml_t5b").columns.length == 4)
    spark.sql("drop table graft_dml_t5b")
  }

  test("CREATE OR REPLACE TABLE: self-reference reads old data; failure leaves original intact") {
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_dml_cor")
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_dml_cor__graft_cow")
    psql.sql("create table graft_dml_cor as select 1 as a union all select 2 union all select 3")
    // self-referencing replacement: shadow-first means the body reads the
    // OLD rows (probed DuckDB semantics)
    psql.sql("create or replace table graft_dml_cor as select a from graft_dml_cor where a < 3")
    assert(spark.table("graft_dml_cor").count() == 2)
    // a failing body never destroys the original
    intercept[Exception] {
      psql.sql("create or replace table graft_dml_cor as select * from graft_dml_no_such_table")
    }
    assert(spark.table("graft_dml_cor").count() == 2)
    // OR REPLACE of a non-existent table simply creates it
    spark.sql("drop table graft_dml_cor")
    psql.sql("create or replace table graft_dml_cor as select 9 as a")
    assert(spark.table("graft_dml_cor").collect().map(_.getInt(0)).toSeq == Seq(9))
    spark.sql("drop table graft_dml_cor")
  }

  test("DML fails loudly on unsafe/unsupported targets") {
    seed("graft_dml_t4")
    // temp view target: copy-on-write would rewrite files the catalog
    // does not own
    spark.table("graft_dml_t4").createOrReplaceTempView("graft_dml_view")
    val e1 = intercept[IllegalArgumentException] {
      psql.sql("delete from graft_dml_view where id = 1")
    }
    assert(e1.getMessage.contains("MANAGED"), e1.getMessage)
    // join-update without a WHERE would be a cross-join update — refuse
    val e3 = intercept[IllegalArgumentException] {
      psql.sql("update graft_dml_t4 set v = o.v from graft_dml_t4 o")
    }
    assert(e3.getMessage.contains("WHERE"), e3.getMessage)
    // unknown SET column
    val e4 = intercept[IllegalArgumentException] {
      psql.sql("update graft_dml_t4 set nope = 1")
    }
    assert(e4.getMessage.contains("nope"), e4.getMessage)
    // nothing above touched the data
    assert(spark.table("graft_dml_t4").count() == 3)
  }

  private def seedPartitioned(name: String): Unit = {
    graft.operators.Bucketing.dropTableAndLocation(spark, name)
    graft.operators.Bucketing.dropTableAndLocation(spark, name + "__graft_cow")
    Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "b"),
        (5L, 50L, "c"), (6L, 60L, "c"))
      .toDF("id", "v", "pt")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy("pt").saveAsTable(name)
  }

  private def filesByPartition(name: String): Map[String, Set[String]] =
    spark.table(name).inputFiles.toSet.groupBy { f =>
      f.split("/").find(_.startsWith("pt=")).getOrElse("?")
    }

  test("partitioned DELETE rewrites only affected partition dirs; emptied partition dropped") {
    seedPartitioned("graft_dml_p1")
    val before = filesByPartition("graft_dml_p1")
    // kills all of pt=a, one row of pt=b, nothing in pt=c
    val r = psql.sql("delete from graft_dml_p1 where v <= 30")
    assert(r.collect()(0).getLong(0) == 3L)
    val rows = spark.table("graft_dml_p1").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(2))).toSeq
    assert(rows == Seq((4L, "b"), (5L, "c"), (6L, "c")))
    val after = filesByPartition("graft_dml_p1")
    // untouched partition keeps its files byte-identical
    assert(after("pt=c") == before("pt=c"), "pt=c must not be rewritten")
    // affected-with-survivors partition was rewritten
    assert(after("pt=b") != before("pt=b"), "pt=b must be rewritten")
    // fully-deleted partition is gone
    assert(!after.contains("pt=a"), "pt=a must be dropped")
    // no-match predicate touches nothing at all
    val files0 = spark.table("graft_dml_p1").inputFiles.toSet
    assert(psql.sql("delete from graft_dml_p1 where v > 999").collect()(0).getLong(0) == 0L)
    assert(spark.table("graft_dml_p1").inputFiles.toSet == files0)
  }

  test("partitioned UPDATE rewrites only matching partitions; SET on a partition column relocates via full rewrite") {
    seedPartitioned("graft_dml_p2")
    val before = filesByPartition("graft_dml_p2")
    val r = psql.sql("update graft_dml_p2 set v = v + 1 where pt = 'a'")
    assert(r.collect()(0).getLong(0) == 2L)
    val after = filesByPartition("graft_dml_p2")
    assert(after("pt=b") == before("pt=b") && after("pt=c") == before("pt=c"),
      "only pt=a may be rewritten")
    assert(spark.table("graft_dml_p2").where("pt = 'a'").orderBy("id")
      .collect().map(_.getLong(1)).toSeq == Seq(11L, 21L))
    // assigning the partition column moves rows between directories —
    // full rewrite path, layout preserved
    psql.sql("update graft_dml_p2 set pt = 'c' where id = 1")
    val moved = spark.table("graft_dml_p2").where("pt = 'c'").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(moved == Seq(1L, 5L, 6L))
    assert(spark.table("graft_dml_p2").where("pt = 'a'").count() == 1)
    // partition layout survived the copy-on-write swap
    assert(spark.catalog.listColumns("graft_dml_p2").collect()
      .filter(_.isPartition).map(_.name).toSeq == Seq("pt"))
  }

  test("RETURNING: DELETE old rows, UPDATE new values, INSERT inserted rows (probed DuckDB)") {
    seed("graft_dml_r1")
    // DELETE returns the deleted rows' values (expressions allowed)
    val d = psql.sql("delete from graft_dml_r1 where v >= 20 returning id, v * 2 as dbl")
    assert(d.columns.toSeq == Seq("id", "dbl"))
    assert(d.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 40L)))
    assert(spark.table("graft_dml_r1").count() == 2)
    // UPDATE returns the NEW values
    val u = psql.sql("update graft_dml_r1 set v = v + 5 where id = 1 returning *")
    assert(u.columns.toSeq == Seq("id", "v", "s"))
    assert(u.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 15L)))
    assert(spark.table("graft_dml_r1").where("id = 1").collect()(0).getLong(1) == 15L)
    // INSERT with a column list: unlisted columns come back NULL; the
    // returned rows are the inserted ones with declared-type casts applied
    val i = psql.sql(
      "insert into graft_dml_r1 (id, v) values (10, 2.5), (11, 7) returning id, v, s")
    assert(i.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) "NULL" else r.getString(2))).toSeq ==
      Seq((10L, 3L, "NULL"), (11L, 7L, "NULL"))) // 2.5 → 3: half-even via GraftCast
    // self-referencing INSERT … SELECT reads the PRE-insert snapshot
    val i2 = psql.sql("""insert into graft_dml_r1
      |select id + 100, v, s from graft_dml_r1 where id >= 10 returning id""".stripMargin)
    assert(i2.as[Long].collect().sorted.toSeq == Seq(110L, 111L))
    assert(spark.table("graft_dml_r1").count() == 6)
    // empty match: empty result, not a Count row
    assert(psql.sql("delete from graft_dml_r1 where v > 999 returning id").count() == 0)
  }

  test("DELETE USING and UPDATE FROM: join DML (probed DuckDB semantics)") {
    seed("graft_dml_j1")
    Seq((1L, 100L), (1L, 101L), (3L, 300L), (9L, 900L)).toDF("id", "nv")
      .createOrReplaceTempView("graft_dml_j1_src")
    // DELETE USING: a row matching ANY source row (even several) deletes
    // once; unmatched source rows are ignored
    val d = psql.sql("""delete from graft_dml_j1 using graft_dml_j1_src s
      |where graft_dml_j1.id = s.id and s.nv < 500""".stripMargin)
    assert(d.collect()(0).getLong(0) == 2L) // ids 1 (two matches) and 3
    assert(spark.table("graft_dml_j1").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // UPDATE FROM: SET references the joined row
    seed("graft_dml_j2")
    Seq((1L, 100L), (3L, 300L)).toDF("id", "nv")
      .createOrReplaceTempView("graft_dml_j2_src")
    val u = psql.sql("""update graft_dml_j2 set v = s.nv, s = 'joined'
      |from graft_dml_j2_src s where graft_dml_j2.id = s.id""".stripMargin)
    assert(u.collect()(0).getLong(0) == 2L)
    val rows = spark.table("graft_dml_j2").orderBy("id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1), x.getString(2)))
    assert(rows.toSeq == Seq((1L, 100L, "joined"), (2L, 20L, "y"), (3L, 300L, "joined")))
    // multi-match UPDATE FROM errors (fail-loud where DuckDB picks one
    // arbitrarily — documented divergence)
    Seq((1L, 5L), (1L, 6L)).toDF("id", "nv")
      .createOrReplaceTempView("graft_dml_j2_dup")
    val e = intercept[IllegalArgumentException] {
      psql.sql("""update graft_dml_j2 set v = s.nv
        |from graft_dml_j2_dup s where graft_dml_j2.id = s.id""".stripMargin)
    }
    assert(e.getMessage.contains("multiple source rows"), e.getMessage)
    // DELETE USING + RETURNING composes (returning rides the exists form)
    seed("graft_dml_j3")
    Seq(Tuple1(2L)).toDF("id").createOrReplaceTempView("graft_dml_j3_src")
    val r = psql.sql("""delete from graft_dml_j3 using graft_dml_j3_src s
      |where graft_dml_j3.id = s.id returning id, v""".stripMargin)
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((2L, 20L)))
  }

  test("INSERT BY NAME matches source columns by name; unknown source column errors") {
    seed("graft_dml_bn")
    // reordered + partial column set: s before id, v omitted → NULL
    psql.sql("insert into graft_dml_bn by name select 'byname' as s, 77 as id")
    val row = spark.table("graft_dml_bn").where("id = 77").collect()(0)
    assert(row.isNullAt(1) && row.getString(2) == "byname")
    // BY NAME + RETURNING compose
    val r = psql.sql(
      "insert into graft_dml_bn by name select 88 as id, 5 as v returning id, v, s")
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1), x.isNullAt(2))).toSeq ==
      Seq((88L, 5L, true)))
    // unknown source column fails loudly (probed DuckDB behavior)
    val e = intercept[IllegalArgumentException] {
      psql.sql("insert into graft_dml_bn by name select 1 as nope")
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
    // plain BY NAME (no RETURNING) returns the Count shape
    val c = psql.sql("insert into graft_dml_bn by name select 99 as id")
    assert(c.columns.toSeq == Seq("Count") && c.collect()(0).getLong(0) == 1L)
  }

  test("WITH-prefixed DML: CTEs visible to DELETE/UPDATE/INSERT (probed DuckDB)") {
    import spark.implicits._
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_wdml_t")
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_wdml_t__graft_cow")
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable("graft_wdml_t")
    // probed DuckDB: WITH big AS (...) DELETE ... → Count 2
    val d = psql.sql("with big as (select k from graft_wdml_t where v > 15) " +
      "delete from graft_wdml_t where k in (select k from big)")
    assert(d.collect()(0).getLong(0) == 2L)
    assert(spark.table("graft_wdml_t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // UPDATE through a CTE
    val u = psql.sql("with big as (select k from graft_wdml_t) " +
      "update graft_wdml_t set v = v + 1 where k in (select k from big)")
    assert(u.collect()(0).getLong(0) == 1L)
    // INSERT through a CTE (plain remainder runs Spark-native in scope)
    psql.sql("with src as (select 9 as k, 90 as v) " +
      "insert into graft_wdml_t select * from src")
    val got = spark.table("graft_wdml_t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 11L), (9L, 90L)))
    // the CTE names are gone after the statement
    assert(!spark.catalog.tableExists("big") && !spark.catalog.tableExists("src"))
    // plain WITH queries stay native (incl. RECURSIVE)
    assert(psql.sql("with a as (select 1 as x) select x + 1 as y from a")
      .collect()(0).getInt(0) == 2)
  }

  test("INSERT INTO t DEFAULT VALUES inserts one all-defaults row (probed DuckDB)") {
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_dml_defv")
    psql.sql("create table graft_dml_defv (i int default 7, v varchar default 'd', n int)")
    assert(psql.sql("insert into graft_dml_defv default values")
      .collect()(0).getLong(0) == 1L)
    val r = spark.table("graft_dml_defv").collect()(0)
    assert((r.getInt(0), r.getString(1), r.isNullAt(2)) == ((7, "d", true)))
    // RETURNING rides the same path (probed DuckDB)
    val ret = psql.sql("insert into graft_dml_defv default values returning i, v")
      .collect()(0)
    assert((ret.getInt(0), ret.getString(1)) == ((7, "d")))
    // a column list before DEFAULT VALUES is rejected, like DuckDB's parser
    // (routes to Spark's parser, which has no such form either — any loud
    // error is correct; nothing may be written)
    intercept[Exception] {
      psql.sql("insert into graft_dml_defv (i) default values")
    }
    assert(spark.table("graft_dml_defv").count() == 2)
  }

  test("WITH-DML CTE shadowing a pre-existing temp view restores it after") {
    import spark.implicits._
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_wdml_sh")
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_wdml_sh__graft_cow")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable("graft_wdml_sh")
    // a user temp view that a CTE name will shadow — in DuckDB a CTE never
    // mutates session state, so the view must survive the statement
    Seq((99L, 1L)).toDF("k", "marker").createOrReplaceTempView("graft_sh_cte")
    val d = psql.sql("with graft_sh_cte as (select k from graft_wdml_sh where v > 15) " +
      "delete from graft_wdml_sh where k in (select k from graft_sh_cte)")
    assert(d.collect()(0).getLong(0) == 1L)
    // the pre-existing view is back, with ITS content (not the CTE's)
    assert(spark.catalog.tableExists("graft_sh_cte"))
    val r = spark.table("graft_sh_cte").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((99L, 1L)))
    spark.catalog.dropTempView("graft_sh_cte")
  }

  test("typo'd clauses error instead of silently widening the statement") {
    seed("graft_dml_t5")
    // a typo'd WHERE must NOT fall through to an unconditional DELETE —
    // DuckDB rejects the statement; silent acceptance is total data loss
    val e1 = intercept[IllegalArgumentException] {
      psql.sql("delete from graft_dml_t5 wehre v > 15")
    }
    assert(e1.getMessage.contains("unexpected text"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      psql.sql("delete from graft_dml_t5 where2 v > 15")
    }
    assert(e2.getMessage.contains("unexpected text"), e2.getMessage)
    // a WHERE misplaced before SET must NOT become an unconditional UPDATE
    val e3 = intercept[IllegalArgumentException] {
      psql.sql("update graft_dml_t5 where id = 1 set v = 2")
    }
    assert(e3.getMessage.contains("SET right after"), e3.getMessage)
    // nothing above touched the data
    val rows = spark.table("graft_dml_t5").orderBy("id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (3L, -1L)))
    // the well-formed statements still parse
    assert(psql.sql("delete from graft_dml_t5 where v > 15")
      .collect()(0).getLong(0) == 1L)
    assert(psql.sql("update graft_dml_t5 set v = 2 where id = 1")
      .collect()(0).getLong(0) == 1L)
  }
}
