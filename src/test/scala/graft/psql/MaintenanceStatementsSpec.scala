package graft.psql

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** DuckDB maintenance statements (MaintenanceStatements): ANALYZE feeds
  * Spark's catalog stats, VACUUM/CHECKPOINT are documented no-ops with
  * validated arguments, COMMENT ON lands in table properties / column
  * metadata and round-trips through DESCRIBE.
  */
class MaintenanceStatementsSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  private def seed(name: String): Unit = {
    graft.operators.Bucketing.dropTableAndLocation(spark, name)
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(name)
  }

  test("ANALYZE t computes table + column stats visible to the optimizer") {
    seed("graft_mt_t1")
    psql.sql("analyze graft_mt_t1")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_mt_t1")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("Statistics").contains("3 rows"),
      s"expected row-count stats, got: ${desc.get("Statistics")}")
    val colStats = spark.sql("DESCRIBE TABLE EXTENDED graft_mt_t1 k")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(colStats.get("distinct_count").exists(_ == "3"),
      s"expected per-column stats from FOR ALL COLUMNS, got: $colStats")
  }

  test("bare ANALYZE covers the current database's tables (table-level stats)") {
    seed("graft_mt_t2")
    psql.sql("analyze")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_mt_t2")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("Statistics").contains("3 rows"))
  }

  test("VACUUM: bare + named no-op, typo'd table errors, VACUUM ANALYZE = ANALYZE") {
    seed("graft_mt_t3")
    assert(psql.sql("vacuum").count() == 0)
    assert(psql.sql("vacuum graft_mt_t3").count() == 0)
    val e = intercept[IllegalArgumentException] { psql.sql("vacuum graft_mt_nope") }
    assert(e.getMessage.contains("does not exist"))
    psql.sql("vacuum analyze graft_mt_t3")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_mt_t3")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("Statistics").contains("3 rows"))
  }

  test("CHECKPOINT / FORCE CHECKPOINT accepted; trailing text rejected") {
    assert(psql.sql("checkpoint").count() == 0)
    assert(psql.sql("force checkpoint").count() == 0)
    intercept[IllegalArgumentException] { psql.sql("checkpoint mydb") }
  }

  test("COMMENT ON TABLE/COLUMN round-trips; IS NULL clears; bad class throws") {
    seed("graft_mt_t4")
    psql.sql("comment on table graft_mt_t4 is 'it''s a table'")
    def tableComment(): Option[String] =
      spark.sql("DESCRIBE TABLE EXTENDED graft_mt_t4").collect()
        .find(_.getString(0) == "Comment").map(_.getString(1))
    assert(tableComment().contains("it's a table"))
    psql.sql("comment on table graft_mt_t4 is null")
    assert(tableComment().isEmpty)
    psql.sql("comment on column graft_mt_t4.k is 'the key'")
    val kRow = spark.sql("DESCRIBE graft_mt_t4").collect()
      .find(_.getString(0) == "k").get
    assert(kRow.getString(2) == "the key")
    val e = intercept[IllegalArgumentException] {
      psql.sql("comment on sequence s1 is 'x'")
    }
    assert(e.getMessage.contains("TABLE, VIEW, COLUMN"))
  }

  test("INSTALL/LOAD: the reference's own setup script runs; unknown extensions throw") {
    // reference README.md:98,104 — `install psql from community; load psql;`
    assert(psql.sql("install psql from community").count() == 0)
    assert(psql.sql("load psql").count() == 0)
    assert(psql.sql("LOAD httpfs").count() == 0)
    val e = intercept[IllegalArgumentException] { psql.sql("load spatial") }
    assert(e.getMessage.contains("no such loadable extension"))
  }

  test("BEGIN/COMMIT/ROLLBACK throw the per-statement-atomicity explanation") {
    val e = intercept[IllegalArgumentException] { psql.sql("begin transaction") }
    assert(e.getMessage.contains("per-statement atomicity"))
    intercept[IllegalArgumentException] { psql.sql("rollback") }
    intercept[IllegalArgumentException] { psql.sql("commit") }
  }

  test("Spark's native ANALYZE TABLE spelling still delegates") {
    seed("graft_mt_t5")
    psql.sql("ANALYZE TABLE graft_mt_t5 COMPUTE STATISTICS")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_mt_t5")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("Statistics").contains("3 rows"))
  }
}
