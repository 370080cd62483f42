package graft.psql

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** DuckDB v1.4 MERGE INTO lowering: first-clause-wins, NULL-condition
  * three-valued logic, duplicate-acting-match error, by-name shorthands,
  * NOT MATCHED BY SOURCE, insert-only append path, Count result shape.
  */
class MergeStatementSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  private def seedTarget(name: String): Unit = {
    graft.operators.Bucketing.dropTableAndLocation(spark, name)
    graft.operators.Bucketing.dropTableAndLocation(spark, name + "__graft_cow")
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d"))
      .toDF("id", "v", "s")
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(name)
  }

  private def rows(name: String): Seq[(Long, Long, String)] =
    spark.table(name).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

  test("update / delete / insert clauses with conditions; Count totals all three") {
    seedTarget("graft_merge_t1")
    Seq((1L, 100L), (2L, 200L), (9L, 900L), (10L, 5L))
      .toDF("id", "nv").createOrReplaceTempView("graft_merge_s1")
    val r = psql.sql("""merge into graft_merge_t1 t using graft_merge_s1 s
      |  on t.id = s.id
      |when matched and s.nv >= 200 then delete
      |when matched then update set v = t.v + s.nv, s = s || '!'
      |when not matched and s.nv < 800 then insert (id, v, s) values (s.id, s.nv, 'new')
      |""".stripMargin)
    assert(r.columns.toSeq == Seq("Count"))
    // 1 update (id=1), 1 delete (id=2), 1 insert (id=10; id=9 fails nv<800)
    assert(r.collect()(0).getLong(0) == 3L)
    assert(rows("graft_merge_t1") ==
      Seq((1L, 110L, "a!"), (3L, 30L, "c"), (4L, 40L, "d"), (10L, 5L, "new")))
  }

  test("NULL AND-condition skips the clause (three-valued logic); falls to next") {
    seedTarget("graft_merge_t2")
    Seq((1L, Some(100L)), (2L, None)).toDF("id", "nv")
      .createOrReplaceTempView("graft_merge_s2")
    psql.sql("""merge into graft_merge_t2 t using graft_merge_s2 s on t.id = s.id
      |when matched and s.nv > 50 then delete
      |when matched then update set s = 'fell-through'
      |""".stripMargin)
    // id=1: nv>50 true → deleted. id=2: nv NULL → clause skipped → updated.
    assert(rows("graft_merge_t2") ==
      Seq((2L, 20L, "fell-through"), (3L, 30L, "c"), (4L, 40L, "d")))
  }

  test("a target row acted on through two source matches is an error; table untouched") {
    seedTarget("graft_merge_t3")
    Seq((1L, 100L), (1L, 101L)).toDF("id", "nv")
      .createOrReplaceTempView("graft_merge_s3")
    val e = intercept[IllegalArgumentException] {
      psql.sql("""merge into graft_merge_t3 t using graft_merge_s3 s on t.id = s.id
        |when matched then update set v = s.nv""".stripMargin)
    }
    assert(e.getMessage.contains("multiple source rows"), e.getMessage)
    assert(rows("graft_merge_t3").head == ((1L, 10L, "a")))
    // multiple matches are FINE when at most one acts
    val r = psql.sql("""merge into graft_merge_t3 t using graft_merge_s3 s on t.id = s.id
      |when matched and s.nv = 101 then update set v = s.nv
      |when matched then do nothing""".stripMargin)
    assert(r.collect()(0).getLong(0) == 1L)
    assert(rows("graft_merge_t3").head == ((1L, 101L, "a")))
  }

  test("bare UPDATE and bare INSERT are by-name; unmatched columns keep/NULL") {
    seedTarget("graft_merge_t4")
    Seq((2L, "B"), (7L, "G")).toDF("id", "s")
      .createOrReplaceTempView("graft_merge_s4")
    psql.sql("""merge into graft_merge_t4 t using graft_merge_s4 s on t.id = s.id
      |when matched then update
      |when not matched then insert""".stripMargin)
    val got = spark.table("graft_merge_t4").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSeq
    // id=2 updated by name (v untouched — source has no v); id=7 inserted with NULL v
    assert(got == Seq((1L, 10L, "a"), (2L, 20L, "B"), (3L, 30L, "c"),
      (4L, 40L, "d"), (7L, -1L, "G")))
  }

  test("NOT MATCHED BY SOURCE updates/deletes unmatched target rows") {
    seedTarget("graft_merge_t5")
    Seq((1L, 0L)).toDF("id", "nv").createOrReplaceTempView("graft_merge_s5")
    val r = psql.sql("""merge into graft_merge_t5 t using graft_merge_s5 s on t.id = s.id
      |when matched then update set s = 'kept'
      |when not matched by source and t.v >= 40 then delete
      |when not matched by source then update set s = 'stale'""".stripMargin)
    assert(r.collect()(0).getLong(0) == 4L) // 1 matched-update + 1 delete + 2 updates
    assert(rows("graft_merge_t5") ==
      Seq((1L, 10L, "kept"), (2L, 20L, "stale"), (3L, 30L, "stale")))
  }

  test("insert-only merge appends without rewriting the table (and subquery source)") {
    seedTarget("graft_merge_t6")
    spark.sparkContext.setJobGroup("merge-t6", "insert-only")
    val before = spark.table("graft_merge_t6").inputFiles.toSet
    psql.sql("""merge into graft_merge_t6 t
      |using (select 5 as id, 50 as v union all select 1, 999) s on t.id = s.id
      |when not matched then insert values (s.id, s.v, 'ins')""".stripMargin)
    assert(rows("graft_merge_t6") ==
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d"), (5L, 50L, "ins")))
    // append path: every pre-merge file is still part of the table
    val after = spark.table("graft_merge_t6").inputFiles.toSet
    assert(before.subsetOf(after), "insert-only merge must append, not rewrite")
  }

  test("values cast to declared column types with DuckDB assignment rounding") {
    seedTarget("graft_merge_t7")
    Seq((1L, 2.5), (8L, 3.5)).toDF("id", "x")
      .createOrReplaceTempView("graft_merge_s7")
    psql.sql("""merge into graft_merge_t7 t using graft_merge_s7 s on t.id = s.id
      |when matched then update set v = s.x
      |when not matched then insert (id, v) values (s.id, s.x)""".stripMargin)
    val got = spark.table("graft_merge_t7").where("id in (1, 8)").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // double→bigint half-even: 2.5→2, 3.5→4 (GraftCast, not Spark truncate)
    assert(got == Seq((1L, 2L), (8L, 4L)))
  }

  test("partitioned target: MERGE rewrites only affected partitions") {
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_merge_p1")
    graft.operators.Bucketing.dropTableAndLocation(spark, "graft_merge_p1__graft_cow")
    Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "c"))
      .toDF("id", "v", "pt")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy("pt").saveAsTable("graft_merge_p1")
    Seq((1L, 100L), (3L, 300L), (7L, 700L)).toDF("id", "nv")
      .createOrReplaceTempView("graft_merge_p1_src")
    def files(): Map[String, Set[String]] =
      spark.table("graft_merge_p1").inputFiles.toSet.groupBy { f =>
        f.split("/").find(_.startsWith("pt=")).getOrElse("?")
      }
    val before = files()
    val r = psql.sql("""merge into graft_merge_p1 t using graft_merge_p1_src s
      |  on t.id = s.id
      |when matched and s.nv >= 300 then delete
      |when matched then update set v = s.nv
      |when not matched then insert (id, v, pt) values (s.id, s.nv, 'd')
      |""".stripMargin)
    assert(r.collect()(0).getLong(0) == 3L) // 1 update + 1 delete + 1 insert
    val got = spark.table("graft_merge_p1").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq
    assert(got == Seq((1L, 100L, "a"), (2L, 20L, "a"), (4L, 40L, "c"), (7L, 700L, "d")))
    val after = files()
    assert(after("pt=c") == before("pt=c"), "untouched partition must keep its files")
    assert(after("pt=a") != before("pt=a"), "acted-on partition must be rewritten")
    assert(!after.contains("pt=b"), "fully-deleted partition must be dropped")
    assert(after.contains("pt=d"), "insert destination partition must exist")
    // partition layout survived
    assert(spark.catalog.listColumns("graft_merge_p1").collect()
      .filter(_.isPartition).map(_.name).toSeq == Seq("pt"))
    // a SET on the partition column relocates via the full rewrite
    psql.sql("""merge into graft_merge_p1 t using graft_merge_p1_src s on t.id = s.id
      |when matched and s.nv = 100 then update set pt = 'z'""".stripMargin)
    assert(spark.table("graft_merge_p1").where("pt = 'z'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("malformed statements fail loudly") {
    seedTarget("graft_merge_t8")
    Seq((1L, 1L)).toDF("id", "nv").createOrReplaceTempView("graft_merge_s8")
    def bad(stmt: String, msgPart: String): Unit = {
      val e = intercept[IllegalArgumentException](psql.sql(stmt))
      assert(e.getMessage.contains(msgPart), s"$stmt → ${e.getMessage}")
    }
    bad("merge into graft_merge_t8 t using graft_merge_s8 s on t.id = s.id",
      "at least one WHEN")
    bad("""merge into graft_merge_t8 t using graft_merge_s8 s on t.id = s.id
      |when matched then insert values (1, 2, 'x')""".stripMargin,
      "cannot INSERT")
    bad("""merge into graft_merge_t8 t using graft_merge_s8 s on t.id = s.id
      |when not matched then update set v = 1""".stripMargin,
      "can only INSERT")
    bad("""merge into graft_merge_t8 t using graft_merge_s8 s on t.id = s.id
      |when not matched then insert values (1)""".stripMargin,
      "needs all 3")
    bad("""merge into graft_merge_t8 t using graft_merge_s8 s on t.id = s.id
      |when matched then update set nope = 1""".stripMargin,
      "nope")
    bad("""merge into graft_merge_t8 t using (select 1 as id) on t.id = id
      |when matched then delete""".stripMargin,
      "needs an alias")
    // CASE inside the ON condition must not confuse WHEN/THEN splitting
    val r = psql.sql("""merge into graft_merge_t8 t using graft_merge_s8 s
      |on t.id = case when s.nv > 0 then s.id else -1 end
      |when matched and case when s.nv = 1 then true else false end then delete
      |""".stripMargin)
    assert(r.collect()(0).getLong(0) == 1L)
    assert(rows("graft_merge_t8").map(_._1) == Seq(2L, 3L, 4L))
  }

  test("full-path insert side executes ONCE (r14 verdict #3: checkpoint reuse)") {
    // an insert-only merge whose source overlaps nothing: every source row
    // is NOT MATCHED, so the anti-join side is the only source consumer.
    // A counting UDF in the source projection observes evaluations: the
    // localCheckpoint must make the count() and the append read the SAME
    // materialized rows — one evaluation per source row, not two.
    seedTarget("graft_merge_t9")
    // the counter lives in a top-level object: a captured local would be
    // CLONED per task by closure serialization even in local mode
    spark.udf.register("graft_count_eval",
      (x: Long) => { MergeEvalCounter.calls.incrementAndGet(); x })
    val nSrc = 50L
    spark.range(100, 100 + nSrc)
      .selectExpr("id", "graft_count_eval(id * 2) as nv")
      .createOrReplaceTempView("graft_merge_s9")
    MergeEvalCounter.calls.set(0L)
    val r = psql.sql("""merge into graft_merge_t9 t using graft_merge_s9 s on t.id = s.id
      |when not matched then insert (id, v, s) values (s.id, s.nv, 'i')""".stripMargin)
    assert(r.collect()(0).getLong(0) == nSrc)
    val c = MergeEvalCounter.calls.get()
    assert(c >= nSrc, s"source must be evaluated at least once per row: $c of $nSrc")
    assert(c < 2 * nSrc,
      s"insert side evaluated the source twice ($c calls for $nSrc rows) — " +
        "the fullPath localCheckpoint-once contract is broken")
    assert(spark.table("graft_merge_t9").count() == 4 + nSrc)
  }

  test("MERGE UPDATE SET touching key columns re-checks uniqueness (probed DuckDB)") {
    import spark.implicits._
    Seq("graft_merge_upk", "graft_merge_upk__graft_cow").foreach(
      graft.operators.Bucketing.dropTableAndLocation(spark, _))
    psql.sql("create table graft_merge_upk (k int primary key, v int)")
    psql.sql("insert into graft_merge_upk values (1, 10), (2, 20), (3, 30)")
    Seq((2, 1), (3, 9)).toDF("sk", "nk").createOrReplaceTempView("graft_merge_upk_s")
    // SET k = s.nk collapses key 2 onto existing key 1 — must raise and
    // leave the table untouched
    val e = intercept[IllegalArgumentException] {
      psql.sql("""merge into graft_merge_upk t using graft_merge_upk_s s on t.k = s.sk
        |when matched then update set k = s.nk""".stripMargin)
    }
    assert(e.getMessage.contains("violates primary key"), e.getMessage)
    assert(spark.table("graft_merge_upk").count() == 3)
    assert(spark.table("graft_merge_upk").where("k = 2").count() == 1)
    // a key-moving merge that keeps keys distinct passes
    Seq((3, 99)).toDF("sk", "nk").createOrReplaceTempView("graft_merge_upk_s2")
    val ok = psql.sql("""merge into graft_merge_upk t using graft_merge_upk_s2 s on t.k = s.sk
      |when matched then update set k = s.nk""".stripMargin)
    assert(ok.collect()(0).getLong(0) == 1L)
    assert(spark.table("graft_merge_upk").where("k = 99").count() == 1)
  }
}

/** JVM-singleton evaluation counter for the checkpoint-reuse spec (a
  * lambda-captured counter would be cloned per task by closure
  * serialization, even in local mode).
  */
object MergeEvalCounter {
  val calls = new java.util.concurrent.atomic.AtomicLong
}
