package graft.psql

import graft.SparkSpec

/** DuckDB fts surface (FtsIndex): PRAGMA create_fts_index persists the
  * postings/docfreq/stats tables, match_bm25 lowers to a scalar subquery
  * with NULL for non-matching ids, conjunctive mode, overwrite semantics,
  * drop_fts_index, and the honest errors for stemmer/stopword requests the
  * engine cannot satisfy.
  */
class FtsIndexSpec extends SparkSpec {

  import spark.implicits._
  private lazy val psql = Psql(spark)

  private def cleanup(): Unit =
    Seq("fts_main_graft_fts_d_terms", "fts_main_graft_fts_d_docfreq",
      "fts_main_graft_fts_d_stats").foreach(
      graft.operators.Bucketing.dropTableAndLocation(spark, _))

  private def seed(): Unit = {
    cleanup()
    Seq(
      (1L, "hello world hello"),
      (2L, "world peace"),
      (3L, "goodbye cruel world"),
      (4L, ""), // zero-token doc: counts toward N, never scores
      (5L, "hello hello hello hello"))
      .toDF("id", "content").createOrReplaceTempView("graft_fts_d")
  }

  test("index build + match_bm25: tf weighting, NULL for no-match, stable values") {
    seed()
    psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content')")
    // postings carry denormalized dl; stats count ALL 5 docs
    val st = spark.table("fts_main_graft_fts_d_stats").collect()(0)
    assert(st.getLong(0) == 5L && st.getLong(1) == 12L)
    val r = psql.sql("select id, fts_main_graft_fts_d.match_bm25(id, 'hello') as s " +
      "from graft_fts_d order by id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) null else x.getDouble(1)))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r(1)._2 == null && r(2)._2 == null && r(3)._2 == null)
    val s1 = r(0)._2.asInstanceOf[Double]
    val s5 = r(3 + 1)._2.asInstanceOf[Double]
    assert(s1 > 0 && s5 > 0)
    // doc 5 has higher tf but is longer; both positive, doc 5 saturates higher
    assert(s5 > s1, s"expected tf=4 (dl 4) to outscore tf=2 (dl 3): $s5 vs $s1")
  }

  test("multi-term scoring sums per-term contributions; conjunctive filters") {
    seed()
    psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content', overwrite := 1)")
    val rows = psql.sql("select id, " +
      "fts_main_graft_fts_d.match_bm25(id, 'hello world') as s, " +
      "fts_main_graft_fts_d.match_bm25(id, 'hello world', conjunctive := 1) as c " +
      "from graft_fts_d order by id").collect()
    // disjunctive: docs 1,2,3,5 score; conjunctive: only doc 1 has both
    assert(!rows(0).isNullAt(1) && !rows(1).isNullAt(1) &&
      !rows(2).isNullAt(1) && rows(3).isNullAt(1) && !rows(4).isNullAt(1))
    assert(!rows(0).isNullAt(2))
    assert((1 to 4).filter(i => !rows(i).isNullAt(2)).isEmpty,
      "conjunctive must score only documents containing every term")
  }

  test("overwrite guard, drop_fts_index, and missing-index error") {
    seed()
    psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content')")
    val dup = intercept[IllegalArgumentException] {
      psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content')")
    }
    assert(dup.getMessage.contains("overwrite"))
    psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content', overwrite := 1)")
    psql.sql("PRAGMA drop_fts_index('graft_fts_d')")
    assert(!spark.catalog.tableExists("fts_main_graft_fts_d_terms"))
    val miss = intercept[IllegalArgumentException] {
      psql.sql("select fts_main_graft_fts_d.match_bm25(id, 'hello') as s from graft_fts_d")
    }
    assert(miss.getMessage.contains("create_fts_index"))
  }

  test("stemmer/stopwords requests the engine cannot satisfy throw honestly") {
    seed()
    val e1 = intercept[IllegalArgumentException] {
      psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content', stemmer := 'porter')")
    }
    assert(e1.getMessage.contains("stemmer"))
    val e2 = intercept[IllegalArgumentException] {
      psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content', stopwords := 'english')")
    }
    assert(e2.getMessage.contains("stopword"))
    // the accepted spellings work
    psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content', " +
      "stemmer := 'none', stopwords := 'none', overwrite := 1)")
    cleanup()
  }

  test("match_bm25 scores views are statement-scoped: catalog stays stable") {
    seed()
    psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content')")
    def viewCount: Int = spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_fts_scores_"))
    val before = viewCount
    // N distinct queries — each registers a distinct-keyed view during the
    // rewrite; all must be dropped once the statement is analyzed
    (1 to 5).foreach { i =>
      val r = psql.sql(s"select id, fts_main_graft_fts_d.match_bm25(id, 'hello q$i') as s " +
        "from graft_fts_d order by id").collect()
      assert(r.length == 5)
    }
    assert(viewCount == before,
      s"scores views leaked: $viewCount registered vs $before before")
    psql.sql("PRAGMA drop_fts_index('graft_fts_d')")
    cleanup()
  }

  test("the reference-style fts script runs end-to-end after LOAD fts") {
    seed()
    psql.sql("install fts")
    psql.sql("load fts")
    psql.sql("PRAGMA create_fts_index('graft_fts_d', 'id', 'content', overwrite := 1)")
    val top = psql.sql("from graft_fts_d " +
      "|> select id, fts_main_graft_fts_d.match_bm25(id, 'hello world') as score " +
      "|> where score is not null |> order by score desc, id |> limit 2").collect()
    assert(top.length == 2)
    cleanup()
  }
}
